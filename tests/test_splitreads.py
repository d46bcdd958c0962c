"""Subread-loop junction detection (splitReads-subReads.C equivalent).

Builds a read set where several reads are missed-adapter subread
artifacts (template + hairpin + reverse complement of the template) and
checks that (a) verify_overlaps(palindromic_min=...) emits the
duplicate opposite-orientation overlap pairs, (b) detect_bad_regions
confirms a junction inside the artifact reads, and (c) partial-overlap
mode still yields the good-arm evidence that trimming needs.
"""

import pytest
import numpy as np

from canu_tpu.ops import align as AL
from canu_tpu.ops import minhash as MH
from canu_tpu.pipeline.splitreads import detect_bad_regions, subtract_regions
from canu_tpu.sim.simulate import mutate_read, random_genome
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.readset import ReadSet
from canu_tpu.utils import bitpack


def _make_reads(seed=7, err=0.02):
    """20 normal reads tiling a genome + 4 subread-loop artifacts."""
    rng = np.random.default_rng(seed)
    g = random_genome(12_000, seed=seed)
    reads, names = [], []
    # normal reads: 2 kb windows every 500 bp
    i = 0
    for s in range(0, 10_000, 500):
        reads.append(mutate_read(g[s : s + 2000], err, rng))
        names.append(f"norm{i}")
        i += 1
    # artifact reads: fwd arm + rc of the same arm (hairpin loop)
    junctions = []
    for s in (1000, 3000, 5000, 7000):
        arm = g[s : s + 1500]
        artifact = np.concatenate([arm, bitpack.revcomp_codes(arm)])
        reads.append(mutate_read(artifact, err, rng))
        names.append(f"loop{s}")
        junctions.append(len(reads))  # 1-based id
    rs = ReadSet.from_codes_list(reads, names)
    return rs, junctions


def _overlap_store(rs, palindromic_min=3):
    fk = None
    sk = MH.build_sketches(rs, k=16, n_hashes=128, frequent=fk, block_size=64)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=64)
    ov = AL.verify_overlaps(
        rs, pairs, k=16, band=128, max_erate=0.12, min_overlap=300,
        chunk=64, min_shared=3, partial=True, palindromic_min=palindromic_min,
    )
    return OverlapStore.build(ov, rs.n_reads)


@pytest.mark.slow
def test_palindromic_pairs_emit_both_orientations():
    rs, junctions = _make_reads()
    st = _overlap_store(rs)
    # at least one read pair must appear in both orientations
    key = st.a_id.astype(np.int64) * 1_000_000 + st.b_id
    dup = (key[1:] == key[:-1]) & (st.flipped[1:] != st.flipped[:-1])
    assert dup.any(), "no duplicate opposite-orientation overlaps found"
    # and the duplicates involve artifact reads
    dup_reads = set(st.a_id[:-1][dup]) | set(st.b_id[:-1][dup])
    assert dup_reads & set(junctions)


@pytest.mark.slow
def test_junction_detection_and_split():
    rs, junctions = _make_reads()
    st = _overlap_store(rs)
    bad = detect_bad_regions(st)
    found = set(bad) & set(junctions)
    assert len(found) >= 2, f"junctions {junctions}, detected {sorted(bad)}"
    # junction position: the artifacts flip at read-middle (1500 of 3000)
    for rid in found:
        mid_ok = any(lo - 700 <= 1500 <= hi + 700 for lo, hi in bad[rid])
        assert mid_ok, f"read {rid}: regions {bad[rid]} miss the midpoint"
    # normal reads are never flagged
    assert not (set(bad) - set(junctions))


@pytest.mark.slow
def test_partial_overlaps_keep_good_arms():
    """Artifact reads must still receive arm evidence (partial mode)."""
    rs, junctions = _make_reads()
    st = _overlap_store(rs)
    for rid in junctions:
        o = st.overlaps_for(rid)
        assert len(o["a_bgn"]) >= 2, f"artifact read {rid} lost its evidence"


def test_subtract_regions():
    assert subtract_regions([(0, 100)], [(40, 60)]) == [(0, 40), (60, 100)]
    assert subtract_regions([(0, 100)], [(0, 10), (90, 100)]) == [(10, 90)]
    assert subtract_regions([(0, 100)], []) == [(0, 100)]
    assert subtract_regions([(10, 20), (30, 40)], [(15, 35)]) == [(10, 15), (35, 40)]

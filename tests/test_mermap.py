"""mapMers / maskMers / merTrim / mercy equivalents (ops.mermap).

Reference roles: /root/reference/src/meryl/mapMers.C, maskMers.C,
/root/reference/src/merTrim/merTrim.C, /root/reference/src/mercy/mercy.C.
"""

import numpy as np
import pytest

from canu_tpu.ops import mermap as MM
from canu_tpu.ops.kmer import KmerCounts, count_readset_host
from canu_tpu.stores.readset import ReadSet
from canu_tpu.utils.bitpack import codes_to_seq


def _rs(seqs):
    return ReadSet.from_sequences(seqs)


def _db_of(seqs, k):
    return count_readset_host(_rs(seqs), k)


def test_positional_kmers_match_host_counter():
    rng = np.random.default_rng(3)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=n))
            for n in (40, 33, 57)]
    rs = _rs(seqs)
    k = 9
    canon, valid = MM.positional_kmers(rs, k)
    db = count_readset_host(rs, k)
    # multiset of valid positional k-mers == the counter's counted set
    u, c = np.unique(canon[valid], return_counts=True)
    assert np.array_equal(u, db.unique)
    assert np.array_equal(c, db.counts)


def test_map_mers_stats_and_regions():
    # one 20-base repeat planted in two sequences; DB = k-mers of the repeat
    rep = "ACGTACGGTTCAGGACCATT"
    s1 = "T" * 15 + rep + "G" * 15
    s2 = rep + "C" * 25
    rs = _rs([s1, s2])
    k = 8
    db = _db_of([rep], k)
    stats = MM.map_mers_stats(rs, db)
    assert stats[0].n_hits == len(rep) - k + 1
    assert stats[0].bases_covered == len(rep)
    assert stats[1].bases_covered == len(rep)
    canon, valid = MM.positional_kmers(rs, k)
    cnt = MM.db_counts_at(canon, db)
    ivs = MM.covered_intervals(rs, valid & (cnt >= 1), k)
    assert ivs[0].tolist() == [[15, 15 + len(rep)]]
    assert ivs[1].tolist() == [[0, len(rep)]]


def test_mer_trim_picks_longest_trusted_run():
    rng = np.random.default_rng(5)
    core = "".join("ACGT"[c] for c in rng.integers(0, 4, size=120))
    # 3 'reads' sharing the core (trusted, count>=3) with unique junk tails
    reads = []
    for i in range(3):
        junk = "".join("ACGT"[c] for c in rng.integers(0, 4, size=30))
        reads.append(junk + core + junk[::-1])
    rs = _rs(reads)
    db = count_readset_host(rs, 11)
    clear = MM.mer_trim(rs, db, threshold=3, min_length=50)
    for r in range(3):
        b, e = clear[r]
        assert b == 30 and e == 30 + 120, (r, b, e)


def test_mercy_classes():
    genome = "".join(
        "ACGT"[c] for c in np.random.default_rng(7).integers(0, 4, size=300))
    reads = [genome[i:i + 120] for i in range(0, 180, 30)]  # 6x-ish cover
    asm = [genome[:250]]  # assembly missing the tail
    rdb = count_readset_host(_rs(reads), 13)
    adb = count_readset_host(_rs(asm), 13)
    rep = MM.mercy(rdb, adb, low_count=2)
    assert rep.classes["normal"]["distinct"] > 0
    # most normal-class read mers are in the assembly, but the tail's
    # mers are missing
    frac = (rep.classes["normal"]["in_assembly"]
            / rep.classes["normal"]["distinct"])
    assert frac > 0.5


def test_cli_roundtrip(tmp_path):
    from canu_tpu.io.fastx import write_fasta
    from canu_tpu.tools.__main__ import main as tools_main

    rng = np.random.default_rng(9)
    rep = "".join("ACGT"[c] for c in rng.integers(0, 4, size=40))
    fa = tmp_path / "in.fasta"
    write_fasta(str(fa), [("a", "T" * 20 + rep + "A" * 20), ("b", rep)])
    db = count_readset_host(_rs([rep]), 10)
    dbp = tmp_path / "rep.kdb"
    db.save(str(dbp))

    rc = tools_main(["map-mers", "--db", str(dbp), "--fasta", str(fa),
                     "--mode", "regions"])
    assert rc == 0
    out = tmp_path / "masked.fasta"
    rc = tools_main(["mask-mers", "--db", str(dbp), "--fasta", str(fa),
                     "--out", str(out)])
    assert rc == 0
    txt = out.read_text()
    assert "N" * 40 in txt and "TTTT" in txt
    rc = tools_main(["mer-trim", "--fasta", str(fa), "-k", "10",
                     "--threshold", "2", "--min-length", "20"])
    assert rc == 0
    rc = tools_main(["mercy", "--reads", str(fa), "--assembly", str(fa),
                     "-k", "10"])
    assert rc == 0

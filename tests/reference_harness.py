"""Drive the reference Canu v1.6 binaries for differential testing.

Locates binaries built by scripts/build_reference.sh (env
CANU_TPU_REF_BIN overrides the default /tmp/refbuild/Linux-amd64/bin)
and wraps the stage tools the same way the reference pipeline invokes
them (/root/reference/src/pipelines/canu/Gatekeeper.pm:222-260 gkp spec,
Meryl.pm:373-490 meryl flags, OverlapInCore.pm overlap flags).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

REF_BIN = os.environ.get("CANU_TPU_REF_BIN", "/tmp/refbuild/Linux-amd64/bin")


def have_reference() -> bool:
    return all(
        os.access(os.path.join(REF_BIN, t), os.X_OK)
        for t in ("gatekeeperCreate", "meryl", "overlapInCore", "overlapConvert")
    )


def _run(args, cwd):
    r = subprocess.run(
        [os.path.join(REF_BIN, args[0]), *args[1:]],
        cwd=cwd, capture_output=True, text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"reference {args[0]} failed rc={r.returncode}\n{r.stderr[-2000:]}"
        )
    return r


def make_gkpstore(workdir: str, fasta: str, min_read_length: int = 1000) -> str:
    """gatekeeperCreate on one pacbio-raw FASTA; returns store path."""
    gkp = os.path.join(workdir, "ref.gkp")
    with open(gkp, "w") as fh:
        fh.write(f"name   raw\npreset pacbio-raw\n{os.path.abspath(fasta)}\n")
    store = os.path.join(workdir, "ref.gkpStore")
    _run(["gatekeeperCreate", "-minlength", str(min_read_length),
          "-o", store, gkp], workdir)
    return store


def meryl_counts(workdir: str, gkpstore: str, k: int) -> dict[str, int]:
    """Canonical k-mer counts from reference meryl (threshold >= 2).

    Returns {kmer_string: count} for every mer with count >= 2 (the
    count-1 tail is huge and uninteresting for the frequent-mer
    contract).
    """
    out = os.path.join(workdir, f"ref-ms{k}")
    _run(["meryl", "-B", "-C", "-L", "2", "-m", str(k), "-threads", "4",
          "-memory", "2048", "-s", gkpstore, "-o", out], workdir)
    r = _run(["meryl", "-Dt", "-n", "2", "-s", out], workdir)
    counts: dict[str, int] = {}
    cur = 0
    for line in r.stdout.splitlines():
        if line.startswith(">"):
            cur = int(line[1:])
        elif line.strip():
            counts[line.strip().upper()] = cur
    return counts


def overlap_pairs(
    workdir: str,
    gkpstore: str,
    n_reads: int,
    k: int = 16,
    max_erate: float = 0.24,
    min_length: int = 500,
    threads: int = 8,
) -> np.ndarray:
    """overlapInCore over the whole store; returns rows
    (a_iid, b_iid, flipped, a_bgn, a_end, erate_pct100) from
    overlapConvert -coords output."""
    ovb = os.path.join(workdir, "ref.ovb")
    _run(["overlapInCore", "-t", str(threads), "-k", str(k),
          "--maxerate", str(max_erate), "--minlength", str(min_length),
          "-h", f"1-{n_reads}", "-r", f"1-{n_reads}",
          "-o", ovb, gkpstore], workdir)
    r = _run(["overlapConvert", "-G", gkpstore, "-coords", ovb], workdir)
    rows = []
    for line in r.stdout.splitlines():
        f = line.split()
        if len(f) < 9:
            continue
        # ovOverlapAsCoords (/root/reference/src/stores/ovOverlap.C:56-65):
        # a_iid b_iid N|I span a_bgn a_end b_bgn b_end erate
        a, b = int(f[0]), int(f[1])
        flipped = f[2] == "I"
        ab, ae = int(f[4]), int(f[5])
        er = float(f[8])
        rows.append((a, b, int(flipped), ab, ae, int(round(er * 10000))))
    return np.array(rows, dtype=np.int64).reshape(-1, 6)


def overlap_store_rows(
    workdir: str,
    gkpstore: str,
    n_reads: int,
    k: int = 16,
    max_erate: float = 0.24,
    min_length: int = 500,
    threads: int = 2,
) -> np.ndarray:
    """Full overlap-STORE content: overlapInCore -> ovStoreBuild ->
    ovStoreDump -coords.  Returns rows (a_iid, b_iid, flipped, a_bgn,
    a_end, b_bgn, b_end, erate_q) — every symmetrized, sorted row of the
    reference store (BASELINE 'store contents equal modulo ordering';
    /root/reference/src/stores/ovOverlap.H:227-292 accessors,
    ovStoreDump.C -coords mode)."""
    ovb = os.path.join(workdir, "refstore.ovb")
    _run(["overlapInCore", "-t", str(threads), "-k", str(k),
          "--maxerate", str(max_erate), "--minlength", str(min_length),
          "-h", f"1-{n_reads}", "-r", f"1-{n_reads}",
          "-o", ovb, gkpstore], workdir)
    store = os.path.join(workdir, "ref.ovlStore")
    _run(["ovStoreBuild", "-O", store, "-G", gkpstore,
          "-M", "2", ovb], workdir)
    r = _run(["ovStoreDump", "-G", gkpstore, "-O", store, "-coords",
              "-d", f"1-{n_reads}"], workdir)
    rows = []
    for line in r.stdout.splitlines():
        f = line.split()
        if len(f) < 9 or not f[0].isdigit():
            continue
        a, b = int(f[0]), int(f[1])
        flipped = f[2] == "I"
        ab, ae = int(f[4]), int(f[5])
        bb, be = int(f[6]), int(f[7])
        if flipped and bb > be:
            bb, be = be, bb  # AsCoords prints oriented coords when flipped
        er = float(f[8])  # fraction (%7.6f); our erate_q = fraction*10000
        rows.append((a, b, int(flipped), ab, ae, bb, be,
                     int(round(er * 10000))))
    return np.array(rows, dtype=np.int64).reshape(-1, 8)

"""OverlapStore — sorted, per-read-indexed overlap database (ovStore equivalent).

Replaces the reference ovStore
(/root/reference/src/stores/ovStore.{C,H}: sharded files sorted by
(a_iid, b_iid), per-read offset index `ovStoreOfft`, updatable `evalues`
sidecar) with columnar numpy arrays:

  * every overlap is stored TWICE (A->B and B->A), the reference's
    symmetric storage invariant (/root/reference/src/stores/ovStore.H
    "Overlaps stored twice");
  * rows sorted by (a_id, b_id); `index[r]:index[r+1]` slices read r's
    overlaps, replacing ovStoreOfft;
  * coordinates are spans on each read in ITS OWN forward orientation
    plus a `flipped` flag — equivalent information to the reference's
    strand-normalized hangs (/root/reference/src/stores/ovOverlap.H:227-292);
  * erate_q is 0.01%-step fixed point (ovOverlap.H:35-45), replaceable in
    bulk by overlap error adjustment (update_erates == installing the
    `evalues` sidecar, /root/reference/src/overlapErrorAdjustment/
    correctOverlaps.C:210-215).

The reference's distributed bucketize/sort/index build
(ovStoreBucketizer/Sorter/Indexer) collapses to one in-memory lexsort
here; the multi-host path shards rows by a_id range instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..ops.align import OverlapTable

_COLS = ("a_id", "b_id", "flipped", "a_bgn", "a_end", "b_bgn", "b_end", "erate_q")

# packed on-disk record for the external (beyond-RAM) build; layout must
# match native/ovsort.cc Rec exactly (28 bytes, no padding holes)
REC_DTYPE = np.dtype([
    ("a_id", "<u4"), ("b_id", "<u4"),
    ("a_bgn", "<i4"), ("a_end", "<i4"), ("b_bgn", "<i4"), ("b_end", "<i4"),
    ("erate_q", "<u2"), ("flipped", "u1"), ("pad", "u1"),
])
assert REC_DTYPE.itemsize == 28


class OverlapStore:
    def __init__(self, n_reads: int, **cols: np.ndarray):
        self.n_reads = n_reads
        for c in _COLS:
            setattr(self, c, cols[c])
        self._build_index()

    def _build_index(self) -> None:
        # index[r] = first row with a_id == r; rows sorted by (a_id, b_id)
        self.index = np.zeros(self.n_reads + 2, dtype=np.int64)
        counts = np.bincount(self.a_id, minlength=self.n_reads + 1)
        np.cumsum(counts, out=self.index[1 : len(counts) + 1])
        self.index[len(counts) + 1 :] = self.index[len(counts)]

    # ---- construction ----

    @classmethod
    def build(cls, table: OverlapTable, n_reads: int) -> "OverlapStore":
        """Symmetrize + sort an OverlapTable (A->B rows only) into a store."""
        a_id = np.concatenate([table.a_id, table.b_id])
        b_id = np.concatenate([table.b_id, table.a_id])
        flipped = np.concatenate([table.flipped, table.flipped])
        a_bgn = np.concatenate([table.a_bgn, table.b_bgn])
        a_end = np.concatenate([table.a_end, table.b_end])
        b_bgn = np.concatenate([table.b_bgn, table.a_bgn])
        b_end = np.concatenate([table.b_end, table.a_end])
        erate_q = np.concatenate([table.erate_q, table.erate_q])
        order = np.lexsort((b_id, a_id))
        return cls(
            n_reads,
            a_id=a_id[order].astype(np.int32),
            b_id=b_id[order].astype(np.int32),
            flipped=flipped[order],
            a_bgn=a_bgn[order].astype(np.int32),
            a_end=a_end[order].astype(np.int32),
            b_bgn=b_bgn[order].astype(np.int32),
            b_end=b_end[order].astype(np.int32),
            erate_q=erate_q[order].astype(np.uint16),
        )

    # ---- construction at scale (streaming spill + external sort) ----

    @classmethod
    def from_records(cls, recs: np.ndarray, n_reads: int) -> "OverlapStore":
        """Store from an already-(a_id, b_id)-sorted REC_DTYPE array."""
        return cls(
            n_reads,
            a_id=recs["a_id"].astype(np.int32),
            b_id=recs["b_id"].astype(np.int32),
            flipped=recs["flipped"].astype(bool),
            a_bgn=np.ascontiguousarray(recs["a_bgn"]),
            a_end=np.ascontiguousarray(recs["a_end"]),
            b_bgn=np.ascontiguousarray(recs["b_bgn"]),
            b_end=np.ascontiguousarray(recs["b_end"]),
            erate_q=np.ascontiguousarray(recs["erate_q"]),
        )

    @classmethod
    def build_spilled(cls, spill: "OverlapSpill", n_reads: int,
                      mem_budget: int = 1 << 30,
                      n_threads: int = 0) -> "OverlapStore":
        """Build from a spill file via the native external merge sort
        (replaces the reference's grid-parallel bucketize/sort/index
        build for stores that exceed RAM); numpy lexsort fallback."""
        from ..native import ovsort_file

        spill.close()
        out = spill.path + ".sorted"
        n = None
        try:
            n = ovsort_file(spill.path, out, os.path.dirname(spill.path) or ".",
                            mem_budget, n_threads)
        except OSError:
            n = None
        if n is None:  # no native toolchain: in-memory fallback
            recs = np.fromfile(spill.path, dtype=REC_DTYPE)
            order = np.lexsort((recs["b_id"], recs["a_id"]))
            st = cls.from_records(recs[order], n_reads)
            os.remove(spill.path)
            return st
        recs = np.memmap(out, dtype=REC_DTYPE, mode="r")
        st = cls.from_records(recs, n_reads)
        del recs
        os.remove(spill.path)
        os.remove(out)
        return st

    @staticmethod
    def save_from_row_shards(shard_paths: list[str], n_reads: int,
                             path: str | os.PathLike) -> None:
        """Write a v2 store directly from per-process sorted row shards
        (int32[m, 8] .npy files in _COLS order, globally sorted when
        concatenated in list order — the range-exchange contract).
        STREAMING: columns are copied shard-by-shard into pre-sized
        memmaps, so the writer never holds the whole table in RAM (the
        reference's ovStoreIndexer merge role, SURVEY.md §3.3)."""
        path = os.fspath(path)
        tmp = path + ".WORKING"
        os.makedirs(tmp, exist_ok=True)
        sizes = []
        for sp in shard_paths:
            arr = np.load(sp, mmap_mode="r")
            assert arr.ndim == 2 and arr.shape[1] == 8, sp
            sizes.append(len(arr))
            del arr
        total = int(sum(sizes))
        dtypes = {"a_id": np.int32, "b_id": np.int32, "flipped": np.bool_,
                  "a_bgn": np.int32, "a_end": np.int32, "b_bgn": np.int32,
                  "b_end": np.int32, "erate_q": np.uint16}
        from numpy.lib.format import open_memmap

        for ci, c in enumerate(_COLS):
            dst = open_memmap(os.path.join(tmp, c + ".npy"), mode="w+",
                              dtype=dtypes[c], shape=(total,))
            off = 0
            for sp, sz in zip(shard_paths, sizes):
                arr = np.load(sp, mmap_mode="r")
                dst[off : off + sz] = arr[:, ci].astype(dtypes[c])
                off += sz
                del arr
            dst.flush()
            del dst
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"version": 2, "n_reads": n_reads, "rows": total}, fh)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.rename(tmp, path)

    # ---- access ----

    def __len__(self) -> int:
        return len(self.a_id)

    @property
    def n_overlaps(self) -> int:
        """Distinct overlaps (each stored twice)."""
        return len(self.a_id) // 2

    @property
    def erate(self) -> np.ndarray:
        return self.erate_q.astype(np.float32) / 10000.0

    def row_range(self, read_id: int) -> tuple[int, int]:
        return int(self.index[read_id]), int(self.index[read_id + 1])

    def overlaps_for(self, read_id: int) -> dict[str, np.ndarray]:
        s, e = self.row_range(read_id)
        return {c: getattr(self, c)[s:e] for c in _COLS}

    def n_overlaps_per_read(self) -> np.ndarray:
        return np.diff(self.index[1 : self.n_reads + 2]).astype(np.int64)

    def erate_histogram(self, bins: int = 100, max_erate: float = 0.5) -> np.ndarray:
        """ovStoreHistogram equivalent."""
        h, _ = np.histogram(self.erate, bins=bins, range=(0, max_erate))
        return h

    # ---- mutation ----

    def update_erates(self, new_erate_q: np.ndarray) -> None:
        """Install adjusted evalues (OEA sidecar contract)."""
        assert len(new_erate_q) == len(self.erate_q)
        self.erate_q = new_erate_q.astype(np.uint16)

    # ---- persistence ----

    def save(self, path: str | os.PathLike) -> None:
        """One raw .npy per column (v2): memory-mappable on load — the
        reference mmaps its stores (/root/reference/src/AS_UTL/
        memoryMappedFile.H); a compressed npz would force a whole-RAM
        materialization at the 140 Mb-genome scale."""
        path = os.fspath(path)
        tmp = path + ".WORKING"
        os.makedirs(tmp, exist_ok=True)
        for c in _COLS:
            np.save(os.path.join(tmp, c + ".npy"), getattr(self, c))
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"version": 2, "n_reads": self.n_reads, "rows": len(self)}, fh)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.rename(tmp, path)

    @classmethod
    def load(cls, path: str | os.PathLike, mmap: bool = True) -> "OverlapStore":
        path = os.fspath(path)
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        if meta.get("version", 1) >= 2:
            cols = {
                c: np.load(os.path.join(path, c + ".npy"),
                           mmap_mode="r" if mmap else None)
                for c in _COLS
            }
        else:  # legacy v1 npz store (whole-RAM)
            with np.load(os.path.join(path, "overlaps.npz")) as z:
                cols = {c: z[c] for c in _COLS}
        return cls(meta["n_reads"], **cols)


class OverlapSpill:
    """Streaming writer of symmetrized overlap records to a spill file.

    The scale path of the overlap stage: each verified OverlapTable batch
    is appended (both orientations) without being held in RAM; the final
    store is built by OverlapStore.build_spilled (native external merge
    sort).  Plays the role of the reference's per-job .ovb outputs that
    ovStoreBucketizer scatters (/root/reference/src/stores/
    ovStoreBucketizer.C:50-71)."""

    def __init__(self, path: str):
        self.path = os.fspath(path)
        self._fh = open(self.path, "wb")
        self.n_rows = 0

    def append(self, table: OverlapTable) -> None:
        m = len(table)
        if m == 0:
            return
        recs = np.zeros(2 * m, dtype=REC_DTYPE)
        recs["a_id"][:m] = table.a_id
        recs["a_id"][m:] = table.b_id
        recs["b_id"][:m] = table.b_id
        recs["b_id"][m:] = table.a_id
        recs["a_bgn"][:m] = table.a_bgn
        recs["a_bgn"][m:] = table.b_bgn
        recs["a_end"][:m] = table.a_end
        recs["a_end"][m:] = table.b_end
        recs["b_bgn"][:m] = table.b_bgn
        recs["b_bgn"][m:] = table.a_bgn
        recs["b_end"][:m] = table.b_end
        recs["b_end"][m:] = table.a_end
        recs["erate_q"][:m] = table.erate_q
        recs["erate_q"][m:] = table.erate_q
        recs["flipped"][:m] = table.flipped
        recs["flipped"][m:] = table.flipped
        recs.tofile(self._fh)
        self.n_rows += 2 * m

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

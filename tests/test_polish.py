"""Contig polish: mosaic (read-level error) -> plurality-polished."""

import pytest
import numpy as np

from canu_tpu.ops.consensus import polish_tig, quick_mosaic
from canu_tpu.graph import build_unitigs
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.tigs import CLASS_CONTIG
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.utils import bitpack


@pytest.mark.slow
def test_polish_improves_identity():
    from tests.test_assembly_slice import compute_overlaps, identity_vs_genome

    g = random_genome(12_000, seed=80)
    rs, _ = simulate_reads(
        g, coverage=14, mean_len=1500, min_len=900, max_len=2000,
        error_rate=0.05, seed=81, circular=False,
    )
    ov = compute_overlaps(rs, max_erate=0.25)
    store = OverlapStore.build(ov, rs.n_reads)
    tigs = build_unitigs(store, rs.length, max_erate=0.25)
    big = max((t for t in tigs if t.tig_class == CLASS_CONTIG), key=lambda t: t.length)
    backbone = quick_mosaic(rs, big)
    ident_mosaic = identity_vs_genome(backbone, g)
    polished = polish_tig(rs, big, backbone, band=256, min_cov=2)
    ident_pol = identity_vs_genome(polished, g)
    # mosaic carries ~5% read error; polish should push above 99%
    assert ident_pol > ident_mosaic, (ident_mosaic, ident_pol)
    assert ident_pol >= 0.99, (ident_mosaic, ident_pol)

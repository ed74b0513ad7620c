"""Golden-file regression tests (SURVEY §4 recommendation (a)).

The committed .net/.clus files were produced by the oracle backend; every
backend must reproduce them byte-identically.  These pin the pipeline
semantics across refactors — if a change legitimately alters outputs, the
goldens must be regenerated deliberately.
"""

import filecmp
import os

import pytest

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.pipeline import run_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
DATA = os.path.join(os.path.dirname(__file__), "data")

CASES = [
    ("toy", os.path.join(DATA, "toy.faa")),
    ("synth_small", os.path.join(GOLDEN, "synth_small.faa")),
    ("synth_edge", os.path.join(GOLDEN, "synth_edge.faa")),
    # v2 realistic data: empirical residue frequencies, indels, per-family
    # divergence spread, paralog tail (scripts/regen_goldens.py)
    ("synth_real", os.path.join(GOLDEN, "synth_real.faa")),
]


@pytest.mark.parametrize("name,faa", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize(
    "backend", ["oracle", "dense", "xla", "pallas", "reference"]
)
def test_backend_reproduces_golden(tmp_path, name, faa, backend):
    prefix = str(tmp_path / name)
    cfg = PipelineConfig(backend=backend, row_block=16, col_block=128,
                         candidate_cap=64)
    run_pipeline(faa, prefix, cfg)
    assert filecmp.cmp(prefix + ".net", os.path.join(GOLDEN, name + ".net"),
                       shallow=False), "network differs from golden"
    assert filecmp.cmp(prefix + ".clus", os.path.join(GOLDEN, name + ".clus"),
                       shallow=False), "families differ from golden"


def test_device_bbh_reproduces_golden(tmp_path):
    name, faa = CASES[1]
    prefix = str(tmp_path / name)
    cfg = PipelineConfig(backend="xla", device_bbh=True, row_block=16,
                         col_block=128, candidate_cap=64)
    run_pipeline(faa, prefix, cfg)
    assert filecmp.cmp(prefix + ".net", os.path.join(GOLDEN, name + ".net"),
                       shallow=False)
    assert filecmp.cmp(prefix + ".clus", os.path.join(GOLDEN, name + ".clus"),
                       shallow=False)


def test_determinism_across_runs(tmp_path):
    name, faa = CASES[2]
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    cfg = PipelineConfig(backend="xla", row_block=16, col_block=128)
    run_pipeline(faa, p1, cfg)
    run_pipeline(faa, p2, cfg)
    assert filecmp.cmp(p1 + ".net", p2 + ".net", shallow=False)
    assert filecmp.cmp(p1 + ".clus", p2 + ".clus", shallow=False)


def test_oracle_reproduces_mycoplasma16_reference_golden(tmp_path):
    """Mid-scale committed-golden check (VERDICT r2 #5): the vectorized
    oracle path must byte-reproduce the .net/.clus that the independent
    dict-based reference backend produced for the 16-genome preset
    (bench_cache/mycoplasma16.*, scripts/regen_goldens.py).  Full
    64-genome scale is checked by every bench run
    (extra.matches_reference_golden)."""
    cache = os.path.join(os.path.dirname(__file__), "..", "bench_cache")
    faa = os.path.join(cache, "mycoplasma16.faa")
    if not os.path.exists(faa):
        pytest.skip("bench_cache goldens not present")
    prefix = str(tmp_path / "m16")
    run_pipeline(faa, prefix, PipelineConfig(backend="oracle"))
    assert filecmp.cmp(prefix + ".net",
                       os.path.join(cache, "mycoplasma16.net"),
                       shallow=False)
    assert filecmp.cmp(prefix + ".clus",
                       os.path.join(cache, "mycoplasma16.clus"),
                       shallow=False)


@pytest.mark.parametrize(
    "preset", ["salmonella7", "escherichia10", "xanthomonas14"]
)
def test_dataset_preset_clus_regenerates_from_net(preset, tmp_path):
    """All-dataset golden pinning (VERDICT r3 next #5): for each of the
    remaining reference benchmark datasets (example/*.list.txt,
    README.md:82-88) the committed .clus must byte-regenerate from the
    committed .net through the clustering stage — pinning the netclu
    semantics at salmonella/escherichia/xanthomonas scale without the
    minutes-long score recompute (full pipeline parity at this scale:
    PANDELOS_SLOW_TESTS=1, below)."""
    from pandelos_tpu.pipeline import cluster_from_net

    cache = os.path.join(os.path.dirname(__file__), "..", "bench_cache")
    faa = os.path.join(cache, f"{preset}.faa")
    if not os.path.exists(faa):
        pytest.skip(f"{preset} goldens not present")
    prefix = str(tmp_path / preset)
    cluster_from_net(faa, os.path.join(cache, f"{preset}.net"), prefix)
    assert filecmp.cmp(
        prefix + ".clus", os.path.join(cache, f"{preset}.clus"),
        shallow=False,
    )


@pytest.mark.skipif(
    os.environ.get("PANDELOS_SLOW_TESTS") != "1",
    reason="minutes-long full-scale recompute; set PANDELOS_SLOW_TESTS=1",
)
@pytest.mark.parametrize(
    "preset", ["salmonella7", "escherichia10", "xanthomonas14"]
)
def test_dataset_preset_full_pipeline_golden(preset, tmp_path):
    """Full pipeline byte-parity on the three enterobacteria-scale
    presets (oracle path vs committed reference-backend goldens)."""
    cache = os.path.join(os.path.dirname(__file__), "..", "bench_cache")
    faa = os.path.join(cache, f"{preset}.faa")
    if not os.path.exists(faa):
        pytest.skip(f"{preset} goldens not present")
    prefix = str(tmp_path / preset)
    run_pipeline(faa, prefix, PipelineConfig(backend="oracle"))
    for suffix in (".net", ".clus"):
        assert filecmp.cmp(
            prefix + suffix, os.path.join(cache, preset + suffix),
            shallow=False,
        )

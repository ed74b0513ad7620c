"""Mid-scale differential test: production backends vs the fully
independent reference twin (VERDICT r2 weak #4 / next #4).

The ``reference`` backend computes its integer cells with
``compute_cells_reference`` — a dict-based walk over raw sequences sharing
no code with ``index.py`` / ``native/host_index.cpp`` / ``oracle/cells.py``
— so byte-equal ``.net``/``.clus`` here rules out a systematic bug in the
shared index+cells stages of the production paths, at >= 1k genes on
realistic (v2) data.
"""

import filecmp

from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.io.faa import write_faa
from pandelos_tpu.pipeline import run_pipeline

SPEC = SynthSpec(
    n_genomes=3, n_families=420, singleton_per_genome=10, min_len=80,
    max_len=500, seed=33, aa_freq="mycoplasma", divergence_sigma=0.9,
    indel_rate=0.8, max_paralogs=4, length_lognorm=True,
)


def test_production_matches_independent_reference_at_1k_genes(tmp_path):
    ds = generate(SPEC)
    assert ds.n_sequences >= 1000
    faa = str(tmp_path / "mid.faa")
    write_faa(faa, ds)

    ref = str(tmp_path / "ref")
    run_pipeline(faa, ref, PipelineConfig(backend="reference"))

    for backend in ("pallas", "xla"):
        out = str(tmp_path / backend)
        run_pipeline(faa, out, PipelineConfig(backend=backend))
        assert filecmp.cmp(ref + ".net", out + ".net", shallow=False), (
            f"{backend} .net differs from independent reference"
        )
        assert filecmp.cmp(ref + ".clus", out + ".clus", shallow=False), (
            f"{backend} .clus differs from independent reference"
        )

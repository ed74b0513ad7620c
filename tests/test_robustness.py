"""Edge-case robustness of the full pipeline across backends."""

import numpy as np
import pytest

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.io.faa import FaaDataset
from pandelos_tpu.pipeline import run_pipeline


def _ds(seqs, genomes):
    gn = []
    for g in genomes:
        if g not in gn:
            gn.append(g)
    return FaaDataset(
        sequences=list(seqs),
        names=[f"s{i}" for i in range(len(seqs))],
        descriptions=["d"] * len(seqs),
        seq_genome=[gn.index(g) for g in genomes],
        genome_names=gn,
    )


BACKENDS = ["oracle", "xla"]


@pytest.mark.parametrize("backend", BACKENDS)
def test_single_gene(tmp_path, backend):
    ds = _ds(["ACDEFGHIKL"], ["g0"])
    res = run_pipeline(
        "", str(tmp_path / "x"), PipelineConfig(backend=backend, k=2),
        dataset=ds,
    )
    assert res.edges == []
    assert res.singletons == ["s0"]


@pytest.mark.parametrize("backend", BACKENDS)
def test_all_identical_genes(tmp_path, backend):
    ds = _ds(["ACDEACDE"] * 6, ["g0", "g0", "g1", "g1", "g2", "g2"])
    res = run_pipeline(
        "", str(tmp_path / "x"), PipelineConfig(backend=backend, k=3),
        dataset=ds,
    )
    # all scores are exactly 1.0; every inter pair is a mutual best hit
    assert len(res.families) >= 1
    assert res.singletons == []
    big = max(res.families, key=len)
    assert len(big) == 6


@pytest.mark.parametrize("backend", BACKENDS)
def test_genes_shorter_than_k(tmp_path, backend):
    ds = _ds(["AC", "A", "ACDEFGHIKL", "ACDEFGHIKL"], ["g0", "g0", "g0", "g1"])
    res = run_pipeline(
        "", str(tmp_path / "x"), PipelineConfig(backend=backend, k=3),
        dataset=ds,
    )
    # short genes have empty profiles -> singletons
    assert "s0" in res.singletons and "s1" in res.singletons


@pytest.mark.parametrize("backend", BACKENDS)
def test_single_genome_only_paralogs(tmp_path, backend):
    # intra edges require an inter-genome BBH engagement -> none here
    ds = _ds(["ACDEACDE", "ACDEACDE", "MNPQMNPQ"], ["g0", "g0", "g0"])
    res = run_pipeline(
        "", str(tmp_path / "x"), PipelineConfig(backend=backend, k=3),
        dataset=ds,
    )
    assert res.edges == []
    assert len(res.singletons) == 3


def test_empty_network_writes_outputs(tmp_path):
    ds = _ds(["ACDEFG", "MNPQRS"], ["g0", "g1"])
    prefix = str(tmp_path / "e")
    res = run_pipeline(
        "", prefix, PipelineConfig(backend="xla", k=3), dataset=ds
    )
    import os

    assert os.path.exists(prefix + ".net")
    assert os.path.exists(prefix + ".clus")
    with open(prefix + ".net") as fh:
        assert fh.read() == ""


def test_k_larger_than_all_genes():
    ds = _ds(["ACDE", "ACDF"], ["g0", "g1"])
    res = run_pipeline("", None, PipelineConfig(backend="oracle", k=10),
                       dataset=ds)
    assert res.edges == []
    assert sorted(res.singletons) == ["s0", "s1"]


def test_duplicate_gene_names_detected():
    ds = _ds(["ACDE", "ACDF"], ["g0", "g1"])
    ds.names[1] = ds.names[0]
    assert ds.duplicated_names() == [ds.names[0]]

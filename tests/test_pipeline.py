import json
import os

import numpy as np
import pytest

from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.io.clus import read_clus
from pandelos_tpu.io.net import diff_nets, read_net
from pandelos_tpu.pipeline import cluster_from_net, run_pipeline

DATA = os.path.join(os.path.dirname(__file__), "data")
TOY = os.path.join(DATA, "toy.faa")


def test_toy_end_to_end_oracle(tmp_path):
    prefix = str(tmp_path / "toy")
    res = run_pipeline(TOY, prefix, PipelineConfig(backend="oracle"))
    assert os.path.exists(prefix + ".net")
    assert os.path.exists(prefix + ".clus")
    assert os.path.exists(prefix + ".stats.json")
    # calculate_k.py's entropy formula yields k=1 for the 193-residue toy
    # input, so scoring is residue-count Jaccard: the uncharacterized
    # protein bridges to the two hok paralogs via inter-genome BBH, while
    # the short thr leader stays a singleton.
    assert res.k == 1
    fams = read_clus(prefix + ".clus")
    assert sorted(map(len, fams)) == [1, 3]
    fams_sets = {frozenset(f) for f in fams}
    assert frozenset({"b0001@NC_000913:1"}) in fams_sets
    with open(prefix + ".clus") as fh:
        raw = fh.read().splitlines()
    # the never-in-net singleton carries the reference's trailing space
    assert [l for l in raw if l.endswith(" ")] == ["b0001@NC_000913:1 "]


def test_oracle_vs_xla_full_pipeline(tmp_path):
    ds = generate(SynthSpec(n_genomes=3, n_families=12, singleton_per_genome=3,
                            min_len=30, max_len=90, seed=5))
    p1 = str(tmp_path / "oracle")
    p2 = str(tmp_path / "xla")
    r1 = run_pipeline("", p1, PipelineConfig(backend="oracle"), dataset=ds)
    r2 = run_pipeline(
        "",
        p2,
        PipelineConfig(backend="xla", row_block=16, col_block=128),
        dataset=ds,
    )
    assert r1.k == r2.k
    rep = diff_nets(read_net(p1 + ".net"), read_net(p2 + ".net"), tolerance=0.0)
    assert rep["identical"], rep
    assert read_clus(p1 + ".clus") == read_clus(p2 + ".clus")
    assert r1.clus_lines == r2.clus_lines


def test_synthetic_family_recovery(tmp_path):
    """The pipeline should recover the planted synthetic families."""
    spec = SynthSpec(
        n_genomes=4,
        n_families=20,
        singleton_per_genome=2,
        min_len=60,
        max_len=200,
        substitution_rate=0.03,
        paralog_rate=0.0,
        seed=21,
    )
    ds = generate(spec)
    res = run_pipeline("", None, PipelineConfig(backend="oracle"), dataset=ds)
    # every multi-member family should be family-pure (names carry fam ids)
    impure = 0
    planted = 0
    for fam in res.families:
        if len(fam) < 2:
            continue
        planted += 1
        fam_ids = {n.split("_")[0] for n in fam}
        if len(fam_ids) > 1:
            impure += 1
    assert planted >= 15
    assert impure == 0


def test_complexity_mode():
    ds = generate(SynthSpec(n_genomes=2, n_families=5, singleton_per_genome=0,
                            min_len=30, max_len=60, seed=3))
    res = run_pipeline("", None, PipelineConfig(only_complexity=True), dataset=ds)
    assert res.stats["complexity"]["total_lookups"] > 0
    assert res.edges == []


def test_checkpoint_and_resume(tmp_path):
    ds = generate(SynthSpec(n_genomes=3, n_families=8, singleton_per_genome=1,
                            min_len=30, max_len=80, seed=9))
    ckpt = str(tmp_path / "ckpt")
    prefix = str(tmp_path / "full")
    faa_path = str(tmp_path / "ds.faa")
    from pandelos_tpu.io.faa import write_faa

    write_faa(faa_path, ds)
    res = run_pipeline(
        faa_path,
        prefix,
        PipelineConfig(backend="oracle", checkpoint_dir=ckpt),
    )
    assert os.path.exists(os.path.join(ckpt, "index.npz"))
    assert os.path.exists(os.path.join(ckpt, "network.net"))
    # resume clustering from the .net checkpoint
    prefix2 = str(tmp_path / "resumed")
    res2 = cluster_from_net(
        faa_path, os.path.join(ckpt, "network.net"), prefix2
    )
    assert read_clus(prefix + ".clus") == read_clus(prefix2 + ".clus")


def test_cli_smoke(tmp_path):
    from pandelos_tpu.cli import main

    prefix = str(tmp_path / "out")
    assert main(["run", TOY, prefix, "--backend", "oracle"]) == 0
    assert main(["k", TOY]) == 0
    assert main(["check", prefix + ".net", prefix + ".net"]) == 0
    assert main(["cluster", TOY, prefix + ".net", str(tmp_path / "out2")]) == 0
    assert main(["complexity", TOY]) == 0
    assert main(["quality", TOY, prefix + ".clus"]) == 0

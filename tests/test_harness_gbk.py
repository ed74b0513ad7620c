import json
import os

import numpy as np

from pandelos_tpu.bench.harness import auto_sweep, reinput, run_measured
from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.io.faa import write_faa
from pandelos_tpu.io.gbk import gbk_dir_to_faa


def test_reinput_truncation():
    ds = generate(SynthSpec(n_genomes=4, n_families=10, singleton_per_genome=2,
                            min_len=20, max_len=40, seed=1))
    sub = reinput(ds, max_sequences=15)
    assert sub.n_sequences == 15
    assert sub.sequences == ds.sequences[:15]
    sub2 = reinput(ds, max_genomes=2)
    assert sub2.n_genomes == 2
    assert set(sub2.seq_genome) == {0, 1}
    # genome ids re-densified in first-appearance order
    assert sub2.genome_names == ds.genome_names[:2]


def test_run_measured(tmp_path):
    ds = generate(SynthSpec(n_genomes=2, n_families=6, singleton_per_genome=1,
                            min_len=30, max_len=60, seed=2))
    res, bench = run_measured(
        None, str(tmp_path / "m"), PipelineConfig(backend="oracle"), dataset=ds
    )
    assert bench.real_s > 0
    assert bench.memory_mb > 0
    assert os.path.exists(str(tmp_path / "m.clus"))


def test_auto_sweep(tmp_path):
    ds = generate(SynthSpec(n_genomes=3, n_families=10, singleton_per_genome=1,
                            min_len=25, max_len=60, seed=3))
    faa = str(tmp_path / "d.faa")
    write_faa(faa, ds)
    reports = auto_sweep(
        faa,
        str(tmp_path / "sweep"),
        backend_new="xla",
        backend_ref="oracle",
        seq_start=10,
        seq_jump=20,
        seq_factor=2.0,
        max_rounds=3,
        in_process=True,  # subprocess rusage covered by its own test
    )
    assert len(reports) >= 2
    assert all(r["check"]["identical"] for r in reports)
    log = str(tmp_path / "sweep" / "log.json")
    with open(log) as fh:
        lines = [json.loads(line) for line in fh]
    assert len(lines) == len(reports)


GBK_SAMPLE = """LOCUS       TEST0001                 200 bp    DNA     circular BCT 01-JAN-2020
DEFINITION  Test genome.
VERSION     TEST0001.1
FEATURES             Location/Qualifiers
     source          1..200
                     /organism="Testus exampleus"
     CDS             1..60
                     /locus_tag="T1_0001"
                     /product="hypothetical protein alpha"
                     /translation="MKRISTTITTTITITTGNGAG"
     gene            61..120
                     /locus_tag="T1_0002"
     CDS             61..120
                     /locus_tag="T1_0002"
                     /product="beta protein"
                     /translation="MLTKYALVAVIVLCLTVPGFTLLVGDSLCEFTVKERNIEFRAV
                     LAYEPKK"
     CDS             121..150
                     /locus_tag="T1_0003"
                     /pseudo
ORIGIN
        1 atgcatgc
//
"""


def test_gbk_parser(tmp_path):
    d = tmp_path / "gbks"
    d.mkdir()
    (d / "test1.gbk").write_text(GBK_SAMPLE)
    ds = gbk_dir_to_faa(str(d))
    assert ds.n_genomes == 1
    # pseudo CDS without translation skipped
    assert ds.n_sequences == 2
    assert ds.sequences[0] == "MKRISTTITTTITITTGNGAG"
    # multi-line translation joined without spaces
    assert ds.sequences[1].startswith("MLTKYALVAVIVLCLTV")
    assert "LAYEPKK" in ds.sequences[1]
    assert " " not in ds.sequences[1]
    assert ds.names[0] == "test1:TEST0001.1:T1_0001:1"
    assert ds.descriptions[1] == "beta protein"


def test_cli_new_subcommands(tmp_path):
    from pandelos_tpu.cli import main

    out = str(tmp_path / "toy.faa")
    assert main(["synth", "toy", out]) == 0
    sub = str(tmp_path / "sub.faa")
    assert main(["reinput", out, sub, "--max-sequences", "4"]) == 0
    assert main(["bench", sub, str(tmp_path / "b"), "--backend", "oracle"]) == 0


def test_cli_examples_runner(tmp_path):
    """C27: the one-command example runner (example/run_examples.sh:3-13)
    — synth stand-in, pipeline, quality report per dataset."""
    import json

    from pandelos_tpu.cli import main

    wd = str(tmp_path / "wd")
    assert main(
        ["examples", wd, "--presets", "toy", "--backend", "oracle"]
    ) == 0
    summary = json.load(open(str(tmp_path / "wd" / "examples.json")))
    assert summary["toy"]["n_families"] == 4
    assert summary["toy"]["quality"]["n_genomes"] == 2
    assert (tmp_path / "wd" / "toy.clus").exists()


def test_run_measured_subprocess(tmp_path):
    """Per-run child-process rusage (manager.rs:79-98 semantics): the
    child's memory_mb is its own peak, not this process's high-water."""
    from pandelos_tpu.bench.harness import run_measured_subprocess
    from pandelos_tpu.config import PipelineConfig

    ds = generate(SynthSpec(n_genomes=2, n_families=6,
                            singleton_per_genome=1,
                            min_len=25, max_len=60, seed=5))
    faa = str(tmp_path / "d.faa")
    write_faa(faa, ds)
    bench = run_measured_subprocess(
        faa, str(tmp_path / "out"), PipelineConfig(backend="oracle")
    )
    assert bench.real_s > 0
    assert 0 < bench.memory_mb < 4096
    assert (tmp_path / "out.net").exists()

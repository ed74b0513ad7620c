import os

import numpy as np
import pytest

from pandelos_tpu.io.clus import family_lines, read_clus, write_clus
from pandelos_tpu.io.faa import read_faa, write_faa
from pandelos_tpu.io.net import diff_nets, read_net, write_net

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_read_toy_faa():
    ds = read_faa(os.path.join(DATA, "toy.faa"))
    assert ds.n_sequences == 4
    assert ds.n_genomes == 2
    # genome ids assigned in first-appearance order (PangeneIData.java:57-62)
    assert ds.genome_names == ["NC_000913", "NC_002655"]
    assert ds.seq_genome == [0, 0, 1, 1]
    assert ds.names[0] == "b0001@NC_000913:1"
    assert ds.sequences[0] == "MKRISTTITTTITITTGNGAG"
    assert ds.descriptions[3] == "protein HokE"
    assert ds.genome_sets() == [[0, 1], [2, 3]]


def test_faa_roundtrip(tmp_path):
    ds = read_faa(os.path.join(DATA, "toy.faa"))
    p = str(tmp_path / "rt.faa")
    write_faa(p, ds)
    ds2 = read_faa(p)
    assert ds2 == ds


def test_faa_blank_lines(tmp_path):
    p = str(tmp_path / "b.faa")
    with open(p, "w") as fh:
        fh.write("g1\ta\tdesc\n\nAAAA\n\n\ng1\tb\tdesc\nCCCC\n\n")
    ds = read_faa(p)
    assert ds.sequences == ["AAAA", "CCCC"]
    assert ds.names == ["a", "b"]


def test_net_roundtrip_and_diff(tmp_path):
    edges = [(0, 3, np.float32(0.5)), (2, 1, np.float32(0.25))]
    p = str(tmp_path / "a.net")
    write_net(p, edges)
    back = read_net(p)
    assert {(a, b) for a, b, _ in back} == {(0, 3), (1, 2)}
    rep = diff_nets(back, edges)
    assert rep["identical"]
    rep2 = diff_nets(back, [(0, 3, 0.5)])
    assert not rep2["identical"]
    assert rep2["missing_in_first"] == 0
    assert rep2["missing_in_second"] == 1
    # tolerance behaviour (main.rs:144-148)
    rep3 = diff_nets([(0, 3, 0.5)], [(0, 3, 0.5005)])
    assert rep3["identical"]
    rep4 = diff_nets([(0, 3, 0.5)], [(0, 3, 0.502)])
    assert rep4["wrong_weight"] == 1


def test_clus_lines_quirks(tmp_path):
    lines = family_lines([["b", "a"], ["z"]], ["s1"])
    # multi-member: names joined, order preserved from family; GN-split
    # singleton: bare name; never-in-net singleton: trailing space
    assert lines == sorted({"b a", "z", "s1 "})
    p = str(tmp_path / "x.clus")
    write_clus(p, lines)
    fams = read_clus(p)
    assert sorted(map(tuple, fams)) == [("b", "a"), ("s1",), ("z",)]


def test_clus_dedup():
    assert family_lines([["a", "b"], ["a", "b"]], []) == ["a b"]


def test_java_double_str_notation_boundaries():
    """Java Double.toString switches to scientific below 1e-3 and at 1e7
    (PangeneNet.java writes scores via string concatenation); Python repr
    switches at 1e-4 with a different exponent style, so the 1e-3/1e-4
    band is where the formats must be proven to diverge correctly."""
    from pandelos_tpu.io.net import java_double_str

    f32 = lambda x: float(np.float32(x))
    assert java_double_str(1.0) == "1.0"
    assert java_double_str(0.001) == "0.001"
    assert java_double_str(f32(0.5)) == "0.5"
    # below 1e-3: scientific with bare exponent (Java), not 0.000...
    assert java_double_str(f32(2.0 ** -11)) == "4.8828125E-4"
    assert java_double_str(f32(1.0 / 1024)) == "9.765625E-4"
    assert java_double_str(f32(1e-4)) == "9.999999747378752E-5"
    assert java_double_str(f32(2.0 ** -20)) == "9.5367431640625E-7"
    # boundary: exactly 1e-3 stays plain
    assert java_double_str(f32(2.0 ** -10)) == "9.765625E-4"
    assert java_double_str(0.0010000000474974513) == "0.0010000000474974513"
    assert java_double_str(0.0) == "0.0"


def test_write_net_sub_1e3_scores(tmp_path):
    from pandelos_tpu.io.net import read_net, write_net

    p = str(tmp_path / "x.net")
    s = float(np.float32(2.0 ** -11))
    write_net(p, [(3, 1, s), (0, 2, 0.25)])
    lines = open(p).read().splitlines()
    assert lines == ["0\t2\t0.25", "1\t3\t4.8828125E-4"]
    assert read_net(p) == [(0, 2, 0.25), (1, 3, s)]


def test_family_report_lines_matches_netclu_stream():
    """F{ }/D{ }/S{ } description stream (netclu_ng.py:117-138): D in
    sorted-member order, S over a real Python set (CPython set order IS
    the reference's behaviour)."""
    from pandelos_tpu.io.clus import family_report_lines

    names = ["g0", "g1", "g2", "g3"]
    descs = ["hypothetical protein", "ABC transporter",
             "hypothetical protein", "permease"]
    lines = family_report_lines([[2, 0], [1, 3]], names, descs)
    assert lines[0] == "F{ g0 ; g2}"
    assert lines[1] == "D{ hypothetical protein ; hypothetical protein}"
    assert lines[2] == "S{ " + " ; ".join({"hypothetical protein"}) + "}"
    assert lines[3] == "-"
    assert lines[4] == "F{ g1 ; g3}"
    assert lines[5] == "D{ ABC transporter ; permease}"
    assert lines[6] == "S{ " + " ; ".join({"ABC transporter", "permease"}) + "}"


def test_pipeline_writes_report(tmp_path):
    import os

    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.pipeline import run_pipeline

    faa = os.path.join(os.path.dirname(__file__), "data", "toy.faa")
    prefix = str(tmp_path / "toy")
    run_pipeline(faa, prefix, PipelineConfig(backend="oracle",
                                             write_report=True))
    text = open(prefix + ".report").read()
    assert "F{ " in text and "D{ " in text and "S{ " in text

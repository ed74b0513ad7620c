"""Run the REFERENCE'S OWN Python phases as truth sources (VERDICT r4 #2).

The reference ships two runnable Python programs that need no JVM:

- ``/root/reference/netclu_ng.py <faa> <net>`` — the clustering phase
  (``netclu_ng.py:117-124`` family printing, invoked at
  ``pandelos.sh:76``); its stdout is postprocessed to ``.clus`` by
  ``grep "F{ " | sed s/F{\\ //g | sed s/}//g | sed s/\\ \\;//g | sort |
  uniq`` (``pandelos.sh:79``).
- ``/root/reference/calculate_k.py <faa>`` — k selection
  (``calculate_k.py:23-30``), stdout-scraped with
  ``grep -E "^k =" | sed s/k\\ =\\ //g`` (``pandelos.sh:67-68``).

These tests subprocess the reference code itself (NOT a transcription)
against our committed goldens, closing the authorship circle: the
clustering/k truth is the reference's executable behavior, leaving only
``Pangenes.java`` (no JVM in this environment) as transcription-pinned —
and its compute core is pinned by the compiled C++ kernel harness
(``tests/test_reference_cpp_kernel.py``).
"""

import filecmp
import os
import subprocess
import sys

import pytest

REFERENCE = os.environ.get("PANDELOS_REFERENCE_DIR", "/root/reference")
NETCLU = os.path.join(REFERENCE, "netclu_ng.py")
CALC_K = os.path.join(REFERENCE, "calculate_k.py")

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "golden")
DATA = os.path.join(HERE, "data")
CACHE = os.path.join(HERE, "..", "bench_cache")

needs_reference = pytest.mark.skipif(
    not (os.path.exists(NETCLU) and os.path.exists(CALC_K)),
    reason="reference checkout not present",
)


def reference_netclu_clus(faa: str, net: str) -> bytes:
    """Run the reference's netclu_ng.py and apply the pandelos.sh:79
    postprocess in-process (grep "F{ " | sed x3 | sort | uniq)."""
    proc = subprocess.run(
        [sys.executable, NETCLU, faa, net],
        capture_output=True, text=True, timeout=600, check=True,
    )
    fams = set()
    for line in proc.stdout.splitlines():
        if "F{ " in line:
            # sed s/F{\ //g ; sed s/}//g ; sed s/\ \;//g
            line = line.replace("F{ ", "").replace("}", "")
            line = line.replace(" ;", "")
            fams.add(line)
    # sort | uniq: LC_ALL-independent byte sort matches our writer's
    return ("".join(f + "\n" for f in sorted(fams))).encode()


def reference_k(faa: str) -> int:
    proc = subprocess.run(
        [sys.executable, CALC_K, faa],
        capture_output=True, text=True, timeout=600, check=True,
    )
    # pandelos.sh:68: grep -E "^k =" | sed s/k\ =\ //g
    for line in proc.stdout.splitlines():
        if line.startswith("k ="):
            return int(line.replace("k = ", "").strip())
    raise AssertionError("reference calculate_k printed no 'k =' line")


NETCLU_CASES = [
    ("toy", os.path.join(DATA, "toy.faa"),
     os.path.join(GOLDEN, "toy.net"), os.path.join(GOLDEN, "toy.clus")),
    ("synth_real", os.path.join(GOLDEN, "synth_real.faa"),
     os.path.join(GOLDEN, "synth_real.net"),
     os.path.join(GOLDEN, "synth_real.clus")),
    ("synth_small", os.path.join(GOLDEN, "synth_small.faa"),
     os.path.join(GOLDEN, "synth_small.net"),
     os.path.join(GOLDEN, "synth_small.clus")),
    ("synth_edge", os.path.join(GOLDEN, "synth_edge.faa"),
     os.path.join(GOLDEN, "synth_edge.net"),
     os.path.join(GOLDEN, "synth_edge.clus")),
    ("mycoplasma16", os.path.join(CACHE, "mycoplasma16.faa"),
     os.path.join(CACHE, "mycoplasma16.net"),
     os.path.join(CACHE, "mycoplasma16.clus")),
    # flagship preset (~70s): with test_reference_cpp_kernel's m64 net
    # provenance this closes the whole flagship golden chain
    ("mycoplasma64", os.path.join(CACHE, "mycoplasma64.faa"),
     os.path.join(CACHE, "mycoplasma64.net"),
     os.path.join(CACHE, "mycoplasma64.clus")),
]


@needs_reference
@pytest.mark.parametrize(
    "name,faa,net,clus", NETCLU_CASES, ids=[c[0] for c in NETCLU_CASES]
)
def test_reference_netclu_matches_golden_clus(name, faa, net, clus):
    """The committed .clus goldens byte-match what the reference's own
    netclu_ng.py + pandelos.sh:79 postprocess produce from the committed
    .net — so our clustering stage (cluster.py) is pinned to the
    reference's executable behavior, not to a transcription."""
    if not os.path.exists(faa):
        pytest.skip(f"{name} inputs not present")
    got = reference_netclu_clus(faa, net)
    with open(clus, "rb") as fh:
        want = fh.read()
    assert got == want, f"{name}: reference netclu output differs from golden"


@needs_reference
def test_reference_netclu_matches_our_pipeline_output(tmp_path):
    """End-to-end circle: run OUR pipeline, then feed our .net to the
    REFERENCE's netclu and check the reference reproduces our .clus."""
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.pipeline import run_pipeline

    faa = os.path.join(GOLDEN, "synth_real.faa")
    prefix = str(tmp_path / "sr")
    run_pipeline(faa, prefix, PipelineConfig(backend="xla", row_block=16,
                                             col_block=128))
    got = reference_netclu_clus(faa, prefix + ".net")
    with open(prefix + ".clus", "rb") as fh:
        ours = fh.read()
    assert got == ours
    assert filecmp.cmp(prefix + ".clus",
                       os.path.join(GOLDEN, "synth_real.clus"), shallow=False)


K_CASES = [
    ("toy", os.path.join(DATA, "toy.faa")),
    ("synth_small", os.path.join(GOLDEN, "synth_small.faa")),
    ("synth_edge", os.path.join(GOLDEN, "synth_edge.faa")),
    ("synth_real", os.path.join(GOLDEN, "synth_real.faa")),
    ("salmonella7", os.path.join(CACHE, "salmonella7.faa")),
    ("escherichia10", os.path.join(CACHE, "escherichia10.faa")),
    ("xanthomonas14", os.path.join(CACHE, "xanthomonas14.faa")),
    ("mycoplasma16", os.path.join(CACHE, "mycoplasma16.faa")),
    ("mycoplasma64", os.path.join(CACHE, "mycoplasma64.faa")),
]


@needs_reference
@pytest.mark.parametrize("name,faa", K_CASES, ids=[c[0] for c in K_CASES])
def test_reference_calculate_k_parity(name, faa):
    """select_k == the reference's own calculate_k.py stdout on every
    preset (calculate_k.py:23-30 / pandelos.sh:67-68)."""
    if not os.path.exists(faa):
        pytest.skip(f"{name} input not present")
    from pandelos_tpu.io.faa import read_faa
    from pandelos_tpu.ksel import select_k

    ds = read_faa(faa)
    assert select_k(ds.sequences) == reference_k(faa)

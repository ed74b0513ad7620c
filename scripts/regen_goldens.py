#!/usr/bin/env python
"""Regenerate committed golden files (tests/golden/*, bench_cache/*).

Goldens are produced by the ``reference`` backend — the whole-run
transcription twin with the independent dict-based cells stage
(pandelos_tpu/reference.py), i.e. by a path sharing no code with the
production engines that the golden tests then check against them.

Usage:
    python scripts/regen_goldens.py            # small cases (seconds)
    python scripts/regen_goldens.py --large    # + mycoplasma64 (minutes)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandelos_tpu.bench.synth import PRESETS, SynthSpec, generate  # noqa: E402
from pandelos_tpu.config import PipelineConfig  # noqa: E402
from pandelos_tpu.io.faa import write_faa  # noqa: E402
from pandelos_tpu.pipeline import run_pipeline  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")
CACHE = os.path.join(REPO, "bench_cache")

# The committed small/mid-scale golden cases.  synth_small/synth_edge are
# the round-1 fixtures (v1 uniform residues; kept frozen as .faa files);
# synth_real is the round-3 realistic case (v2: empirical residue
# frequencies, indels, divergence spread, paralog tail).
SPECS = {
    "synth_small": None,  # frozen .faa, do not regenerate the input
    "synth_edge": None,  # frozen .faa, do not regenerate the input
    "synth_real": SynthSpec(
        n_genomes=4, n_families=120, singleton_per_genome=6, min_len=80,
        max_len=500, seed=21, aa_freq="mycoplasma", divergence_sigma=0.9,
        indel_rate=0.8, max_paralogs=4, length_lognorm=True,
    ),
}


def regen_case(name: str) -> None:
    faa = os.path.join(GOLDEN, f"{name}.faa")
    spec = SPECS.get(name)
    if spec is not None:
        write_faa(faa, generate(spec))
    t0 = time.monotonic()
    run_pipeline(faa, os.path.join(GOLDEN, name),
                 PipelineConfig(backend="reference"))
    print(f"{name}: regenerated in {time.monotonic() - t0:.1f}s")


def regen_toy() -> None:
    faa = os.path.join(REPO, "tests", "data", "toy.faa")
    run_pipeline(faa, os.path.join(GOLDEN, "toy"),
                 PipelineConfig(backend="reference"))
    print("toy: regenerated")


def regen_large(preset: str = "mycoplasma64") -> None:
    """Bench-preset goldens (VERDICT r2 #5): mycoplasma64 and the CPU
    fallback scale mycoplasma16.  The independent dict-cells stage costs
    one Python iteration per reference 'lookup' — minutes at the
    64-genome scale."""
    ds = generate(PRESETS[preset])
    faa = os.path.join(CACHE, f"{preset}.faa")
    write_faa(faa, ds)
    t0 = time.monotonic()
    run_pipeline(faa, os.path.join(CACHE, preset),
                 PipelineConfig(backend="reference"))
    print(f"{preset}: regenerated in {time.monotonic() - t0:.1f}s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if args.only:
        if args.only in PRESETS:
            regen_large(args.only)
        elif args.only == "toy":
            regen_toy()
        else:
            regen_case(args.only)
    else:
        regen_toy()
        for name in SPECS:
            regen_case(name)
        if args.large:
            regen_large("mycoplasma16")
            regen_large("mycoplasma64")

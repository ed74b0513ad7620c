#!/bin/bash
# End-to-end example runs (equivalent of the reference
# example/run_examples.sh): for each benchmark-scale dataset, run the
# pipeline and print quality statistics.  Uses deterministic synthetic
# stand-ins for the reference's NCBI datasets when offline; pass a
# directory of real .faa files to use those instead.
set -euo pipefail

workdir="${1:-/tmp/pandelos_examples}"
mkdir -p "$workdir"

for preset in salmonella7 escherichia10 xanthomonas14 mycoplasma64; do
    faa="$workdir/$preset.faa"
    if [ ! -f "$faa" ]; then
        echo "== generating $preset"
        python -m pandelos_tpu.cli synth "$preset" "$faa"
    fi
    echo "== running $preset"
    python -m pandelos_tpu.cli bench "$faa" "$workdir/$preset"
    echo "== quality $preset"
    python -m pandelos_tpu.cli quality "$faa" "$workdir/$preset.clus" \
        | head -40
done

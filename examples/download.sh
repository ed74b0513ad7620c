#!/bin/bash
# NCBI dataset download (equivalent of the reference example/download.sh):
# fetches GenBank records listed in a .list.txt file (one accession per
# line, reference example/*.list.txt) with NCBI edirect's efetch, then
# converts to .faa.  Requires network access + edirect; in offline
# environments use `pandelos-tpu synth <preset> out.faa` instead.
set -euo pipefail

list="$1"      # file with one NCBI nuccore accession per line
outdir="$2"    # output directory

if ! command -v efetch >/dev/null; then
    echo "error: NCBI edirect (efetch) not found; offline? use:" >&2
    echo "  python -m pandelos_tpu.cli synth <preset> out.faa" >&2
    exit 2
fi

mkdir -p "$outdir/gbk"
while read -r acc; do
    [ -z "$acc" ] && continue
    echo "fetching $acc"
    efetch -db nuccore -id "$acc" -format gbwithparts \
        > "$outdir/gbk/$acc.gbk"
done < "$list"

python -m pandelos_tpu.cli gbk2faa "$outdir/gbk" "$outdir/dataset.faa"
echo "wrote $outdir/dataset.faa"

# Accession lists: the PanDelos paper's four benchmark datasets are the
# NCBI genome sets for Salmonella enterica Typhi (7 isolates), E. coli
# (10), Xanthomonas campestris (14) and Mycoplasma (64); the upstream
# repository ships the accession lists as example/*.list.txt.

"""Deterministic synthetic pan-genome datasets.

The reference benchmarks on four NCBI datasets downloaded with efetch
(``example/download.sh``, ``example/*.list.txt``: salmonella 7 genomes,
escherichia 10, xanthomonas 14, mycoplasma 64).  This environment has no
network access, so scale-matched synthetic datasets stand in: gene families
are simulated by mutating ancestor protein sequences across genomes, with
core/accessory/singleton structure and within-genome paralogs.

Generation is fully deterministic given the seed.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pandelos_tpu.io.faa import FaaDataset

AMINO_ACIDS = "ACDEFGHIKLMNPQRSTVWY"


@dataclasses.dataclass
class SynthSpec:
    n_genomes: int = 7
    n_families: int = 800  # ancestor gene families
    core_fraction: float = 0.5  # families present in every genome
    min_len: int = 120
    max_len: int = 900
    substitution_rate: float = 0.05  # per-residue, per genome copy
    paralog_rate: float = 0.02  # chance a genome carries a duplicated copy
    singleton_per_genome: int = 20  # unique genes per genome
    seed: int = 1234


# Scale-matched stand-ins for the reference's benchmark datasets
# (genome counts from example/*.list.txt; gene counts per genome are
# order-of-magnitude for the organisms).
PRESETS = {
    "toy": SynthSpec(n_genomes=2, n_families=4, core_fraction=1.0,
                     min_len=40, max_len=120, singleton_per_genome=0, seed=7),
    "salmonella7": SynthSpec(n_genomes=7, n_families=4200, seed=11),
    "escherichia10": SynthSpec(n_genomes=10, n_families=4300, seed=12),
    "xanthomonas14": SynthSpec(n_genomes=14, n_families=4100, seed=13),
    "mycoplasma64": SynthSpec(n_genomes=64, n_families=750, min_len=100,
                              max_len=700, seed=14),
}


def _random_protein(rng: np.random.Generator, length: int) -> np.ndarray:
    return rng.integers(0, len(AMINO_ACIDS), size=length, dtype=np.int64)


def _mutate(rng: np.random.Generator, seq: np.ndarray, rate: float) -> np.ndarray:
    out = seq.copy()
    mask = rng.random(seq.shape[0]) < rate
    n = int(mask.sum())
    if n:
        out[mask] = rng.integers(0, len(AMINO_ACIDS), size=n, dtype=np.int64)
    return out


def _to_str(codes: np.ndarray) -> str:
    return "".join(AMINO_ACIDS[c] for c in codes)


def generate(spec: SynthSpec) -> FaaDataset:
    rng = np.random.default_rng(spec.seed)
    sequences, names, descriptions, seq_genome = [], [], [], []
    genome_names = [f"G{g:03d}" for g in range(spec.n_genomes)]

    ancestors = []
    presence = []
    for f in range(spec.n_families):
        length = int(rng.integers(spec.min_len, spec.max_len + 1))
        ancestors.append(_random_protein(rng, length))
        if rng.random() < spec.core_fraction:
            present = np.ones(spec.n_genomes, dtype=bool)
        else:
            p = rng.uniform(0.2, 0.9)
            present = rng.random(spec.n_genomes) < p
            if not present.any():
                present[rng.integers(0, spec.n_genomes)] = True
        presence.append(present)

    # Emit genome-major (like a concatenated multi-genome .faa).
    for g in range(spec.n_genomes):
        gname = genome_names[g]
        for f in range(spec.n_families):
            if not presence[f][g]:
                continue
            copies = 1
            if rng.random() < spec.paralog_rate:
                copies = 2
            for c in range(copies):
                seq = _mutate(rng, ancestors[f], spec.substitution_rate)
                sequences.append(_to_str(seq))
                names.append(f"fam{f:05d}_c{c}@{gname}")
                descriptions.append(f"synthetic family {f} copy {c}")
                seq_genome.append(g)
        for s in range(spec.singleton_per_genome):
            length = int(rng.integers(spec.min_len, spec.max_len + 1))
            sequences.append(_to_str(_random_protein(rng, length)))
            names.append(f"uniq{s:04d}@{gname}")
            descriptions.append("synthetic singleton")
            seq_genome.append(g)

    return FaaDataset(sequences, names, descriptions, seq_genome, genome_names)


def generate_preset(name: str) -> FaaDataset:
    return generate(PRESETS[name])

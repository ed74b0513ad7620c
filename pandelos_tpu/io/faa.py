"""The ``.faa`` inter-phase contract: one parser for the whole pipeline.

Format (reference ``README.md:23-37``): alternating lines; a header line
``genome\tgene_id\tproduct`` followed by a one-line amino-acid sequence.

The reference parses this file three times with three independent parsers
that must agree (``PangeneIData.java:40-66``, ``netclu_ng.py:17-29``,
``calculate_k.py:8-16``).  This module is the single parser.

Index semantics replicated exactly:
- sequence index = order of appearance, 0-based (``PangeneIData.java:55``),
- genome index = order of first appearance (``PangeneIData.java:57-62``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List


@dataclasses.dataclass
class FaaDataset:
    sequences: List[str]
    names: List[str]
    descriptions: List[str]
    seq_genome: List[int]  # per-sequence genome index
    genome_names: List[str]  # index -> genome name (first-appearance order)

    @property
    def n_sequences(self) -> int:
        return len(self.sequences)

    @property
    def n_genomes(self) -> int:
        return len(self.genome_names)

    def genome_sets(self) -> List[List[int]]:
        """Per-genome sequence-id lists (``PangeneIData.getGenomeSets``)."""
        sets: List[List[int]] = [[] for _ in range(self.n_genomes)]
        for i, g in enumerate(self.seq_genome):
            sets[g].append(i)
        return sets

    def duplicated_names(self) -> List[str]:
        """Duplicate gene identifiers (warned about at netclu_ng.py:35-39)."""
        seen: set = set()
        dups = []
        for n in self.names:
            if n in seen:
                dups.append(n)
            seen.add(n)
        return dups


def read_faa(path: str) -> FaaDataset:
    sequences: List[str] = []
    names: List[str] = []
    descriptions: List[str] = []
    seq_genome: List[int] = []
    genome_ids: Dict[str, int] = {}
    genome_names: List[str] = []

    header = None
    with open(path, "r") as fh:
        for raw in fh:
            line = raw.strip()
            # The reference Java parser skips blank lines without toggling
            # the header/sequence state (PangeneIData.java:42-44).
            if not line:
                continue
            if header is None:
                cols = line.split("\t")
                if len(cols) < 3:
                    raise ValueError(
                        f"malformed .faa header (need 3 tab-separated cols): {line!r}"
                    )
                header = (cols[0], cols[1], cols[2])
            else:
                genome_name, gene_name, product = header
                gid = genome_ids.get(genome_name)
                if gid is None:
                    gid = len(genome_ids)
                    genome_ids[genome_name] = gid
                    genome_names.append(genome_name)
                sequences.append(line)
                names.append(gene_name)
                descriptions.append(product)
                seq_genome.append(gid)
                header = None
    if header is not None:
        raise ValueError("malformed .faa: dangling header line without sequence")
    return FaaDataset(sequences, names, descriptions, seq_genome, genome_names)


def write_faa(path: str, ds: FaaDataset) -> None:
    with open(path, "w") as fh:
        for i, seq in enumerate(ds.sequences):
            fh.write(
                f"{ds.genome_names[ds.seq_genome[i]]}\t{ds.names[i]}\t{ds.descriptions[i]}\n"
            )
            fh.write(seq + "\n")

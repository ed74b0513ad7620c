""".clus output format: one gene family per line, names space-separated.

The reference produces it by scraping netclu stdout:
``grep "F{ " | sed s/F{\\ //g | sed s/}//g | sed s/\\ \\;//g | sort | uniq``
(``pandelos.sh:79``).

Quirks replicated for byte parity:
- multi-member families print as ``F{ a ; b}`` -> ``a b`` (no trailing
  space; netclu_ng.py:117-124),
- genes never placed in any family print as ``F{ a }`` -> ``a `` WITH a
  trailing space (netclu_ng.py:174-175 adds a space before ``}``),
- single-member families produced by Girvan-Newman splitting go through
  print_family and thus have NO trailing space,
- lines are sorted lexicographically and deduplicated (sort | uniq).
"""

from __future__ import annotations

from typing import List, Sequence


def family_lines(
    families: Sequence[Sequence[str]], singletons: Sequence[str]
) -> List[str]:
    """Render family lines exactly as the reference's shell post-processing.

    ``families``: member-name lists (already in the printed order, i.e.
    sorted by sequence id as in ``sorted(fam)`` at netclu_ng.py:121).
    ``singletons``: names of genes absent from every family.
    """
    lines = []
    for fam in families:
        lines.append(" ".join(fam))
    for name in singletons:
        lines.append(name + " ")
    # sort | uniq
    return sorted(set(lines))


def write_clus(path: str, lines: Sequence[str]) -> None:
    with open(path, "w") as fh:
        for line in lines:
            fh.write(line + "\n")


def read_clus(path: str) -> List[List[str]]:
    """Read families as lists of gene names (trailing spaces stripped)."""
    fams = []
    with open(path, "r") as fh:
        for line in fh:
            line = line.rstrip("\n")
            names = [n for n in line.split(" ") if n]
            if names:
                fams.append(names)
    return fams


def clus_families_equal(path_a: str, path_b: str) -> bool:
    fa = {frozenset(f) for f in read_clus(path_a)}
    fb = {frozenset(f) for f in read_clus(path_b)}
    return fa == fb

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


def family_report_lines(
    families: Sequence[Sequence[int]],
    names: Sequence[str],
    descriptions: Sequence[str],
) -> List[str]:
    """The netclu per-family report stream around the ``F{ }`` data lines
    (``netclu_ng.py:117-138``): for every family, its ``F{ }`` members,
    a ``D{ }`` line with the members' product descriptions in the same
    order, and an ``S{ }`` line with the distinct descriptions — the
    reference iterates a Python ``set`` there, so the distinct order is
    CPython set-iteration order, replicated here by using a real set —
    followed by the ``-`` separator.  Only ``F{ }`` lines feed ``.clus``
    (``pandelos.sh:79``); this stream is the rest of the observable
    netclu output, for users who consume it directly."""
    out: List[str] = []
    for fam in families:
        members = sorted(fam)
        out.append(
            "F{ " + " ; ".join(names[f] for f in members) + "}"
        )
        descs = [descriptions[f] for f in members]
        out.append("D{ " + " ; ".join(descs) + "}")
        out.append("S{ " + " ; ".join(set(descs)) + "}")
        out.append("-")
    return out


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

"""Family clustering / "de-clustering": connected components + collision
check + recursive Girvan-Newman splitting.

Semantic twin of ``netclu_ng.py``:
- build an undirected graph from the edge list, skipping self-loops
  (netclu_ng.py:54),
- for every connected component (:149) compute the max paralog collision:
  the max over members of the number of same-genome, non-adjacent other
  members (:79-96),
- components with collisions are split recursively with one level of
  unweighted Girvan-Newman per recursion, communities sorted
  (:101-115, ``sorted(c)`` at :106),
- families print members sorted by sequence id (:121),
- genes absent from every family are singletons (:142-175).

Kept on host: components that need GN splitting are small, and the
reference's output depends on networkx's exact unweighted girvan_newman
behaviour, so we call the same library function.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import networkx as nx
import numpy as np


@dataclasses.dataclass
class ClusterResult:
    families: List[List[int]]  # member seq-ids, sorted ascending
    singletons: List[int]  # seq-ids never placed in a family
    component_size_distr: dict
    family_size_distr: dict


def _max_collision(nodes, graph: nx.Graph, seq_genome) -> int:
    """netclu_ng.py:79-96: max number of same-genome non-adjacent pairs."""
    by_genome = {}
    for s in nodes:
        by_genome.setdefault(seq_genome[s], []).append(s)
    max_k = 0
    for members in by_genome.values():
        for s1 in members:
            s_k = 0
            for s2 in members:
                if s1 != s2 and not graph.has_edge(s1, s2):
                    s_k += 1
            if s_k > max_k:
                max_k = s_k
    return max_k


def _split_until_max_k(nodes, graph: nx.Graph, seq_genome) -> List[List[int]]:
    """netclu_ng.py:101-115: one unweighted GN split level per recursion."""
    subgraph = graph.subgraph(nodes)
    gcoms = nx.algorithms.community.centrality.girvan_newman(subgraph)
    coms = tuple(sorted(c) for c in next(gcoms))
    result: List[List[int]] = []
    for com in coms:
        if _max_collision(com, subgraph, seq_genome) > 0:
            result.extend(_split_until_max_k(com, subgraph, seq_genome))
        else:
            result.append(list(com))
    return result


def cluster_network(
    edges: Sequence[Tuple[int, int, float]],
    seq_genome: np.ndarray,
    n_sequences: int,
) -> ClusterResult:
    graph = nx.Graph()
    for a, b, w in edges:
        if a == b:
            # Self-loops are skipped; the lone node would still be added
            # (netclu_ng.py:48-50), but self-cells are zeroed upstream
            # (library.cpp:484-487) so they cannot occur in practice.
            graph.add_node(a)
            continue
        graph.add_edge(a, b, weight=w)

    remaining = set(range(n_sequences))
    families: List[List[int]] = []
    comp_distr: dict = {}
    fam_distr: dict = {}

    for comp in nx.connected_components(graph):
        comp_distr[len(comp)] = comp_distr.get(len(comp), 0) + 1
        if _max_collision(comp, graph, seq_genome) > 0:
            coms = _split_until_max_k(comp, graph, seq_genome)
        else:
            coms = [sorted(comp)]
        for com in coms:
            fam = sorted(com)
            fam_distr[len(fam)] = fam_distr.get(len(fam), 0) + 1
            families.append(fam)
            for g in fam:
                remaining.discard(g)

    return ClusterResult(
        families=families,
        singletons=sorted(remaining),
        component_size_distr=comp_distr,
        family_size_distr=fam_distr,
    )


def families_as_names(result: ClusterResult, names: Sequence[str]):
    """(family name-lists in seq-id order, singleton names) for the .clus
    writer.  Singletons keep the reference's trailing-space rendering
    (see pandelos_tpu.io.clus)."""
    fams = [[names[i] for i in fam] for fam in result.families]
    singles = [names[i] for i in result.singletons]
    return fams, singles

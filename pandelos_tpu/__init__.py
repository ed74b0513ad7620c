"""PanDelos-TPU: a TPU-native pan-genome content-discovery engine.

A from-scratch reimplementation of the capabilities of Guilucand/PanDelos
("PanDelos: a dictionary-based method for pan-genome content discovery",
Bonnici, Giugno, Manca, BMC Bioinformatics 19.15 (2018): 437), redesigned
TPU-first:

- one ingest parser for the ``.faa`` inter-phase contract (the reference has
  three parsers that must agree: ``PangeneIData.java:40-66``,
  ``netclu_ng.py:17-29``, ``calculate_k.py:8-16``),
- entropy-based k selection (``calculate_k.py:23-30``),
- a k-mer multiset index built with vectorized NumPy / optional C++ core
  (replacing the JNI library's rolling ranks + LSD radix sort,
  ``ig/native/library.cpp:189-371``),
- a dense, MXU-friendly generalized-Jaccard scoring pipeline
  (level-decomposed matmuls in a Pallas/XLA kernel replacing the inverted
  index posting-list walk, ``ig/native/library.cpp:409-527``),
- bidirectional-best-hit network construction (``Pangenes.java:98-176``),
- connected components + collision-driven Girvan-Newman family splitting
  (``netclu_ng.py:79-175``),
- a bench/verify harness mirroring the Rust test-framework
  (``benchmark/test-framework/src/*.rs``).
"""

__version__ = "0.1.0"

from pandelos_tpu.config import PipelineConfig  # noqa: F401

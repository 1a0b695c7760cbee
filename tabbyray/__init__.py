"""tabbyray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the semantic-table-interpretation
capabilities of the reference system (tabbydoc/tabbyld) as streaming
``ray.data.Dataset`` pipelines over Common-Crawl-style page tables:
extract -> NER-tag -> CEA/CTA/CPA annotate -> canonicalize -> triples,
plus a library of web-scale training-data operators (dedup, similarity
search, text analysis).
"""

__version__ = "0.1.0"

"""Relational operator library (SURVEY.md §2).

Every operator is a lazy transformation returning a DataFrame; none collects.
Submodules map to the survey's inventory sections:

- ``aggregates``  — §2.4 A1-A15 (means, quantiles, boolean rates, grouped aggs)
- ``filters``     — §2.2 P1-P13 (cleansing, scope, validity, coerce casts)
- ``joins``       — §2.3 J1-J3 (broadcast baseline/dim enrichment joins)
- ``windows``     — §2.5 W1-W8 (rolling, lag, z-score, dedup-keep-last)
- ``topk``        — §2.6 O1-O7 (TakeOrderedAndProject top-k patterns)
- ``reshape``     — §2.7 U1-U4 (union, unpivot, rename)
- ``quality``     — §2.11 Q1-Q3 (data contracts)
- ``dedup``       — beyond-reference: exact / MinHash-LSH / SimHash / Jaccard
- ``similarity``  — beyond-reference: cosine top-k ANN over embeddings
- ``text``        — beyond-reference: lang-ID, quality score, tokens, fingerprint
"""

"""parser_indexer_py_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch reimplementation of the capabilities of
USCDataScience/parser-indexer-py (NASA JPL's Mars Target Encyclopedia
ingestion stack): the parse/enrich pipeline the reference implements in
Python generators, PLUS the full-text half it outsources to Solr/Lucene
(posting-list construction, segment merge, df/cf statistics, BM25 top-k
scoring — see /root/reference/conf/solr/docs/conf/managed-schema and
solrconfig.xml).

Architecture is Spark-first: DataFrame/Catalyst plans, vectorized
Arrow/pandas UDFs only where built-in expressions cannot express the
semantics (varint posting encode/decode), explicit salting for hot-term
skew, broadcast segment metadata at query time.
"""

__version__ = "0.1.0"

"""arekit_r335_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
AREkit reference (TrellixVulnTeam/AREkit_R335, read-only at /root/reference).

Architecture (Spark-first, NOT a port):

* input: a transcripts table ``(conv_id, turn_idx, role, text, tool, ts)``
  where document = conversation and sentence = turn
  (reference: ``arekit/common/news/base.py``).
* one vectorized pandas/Arrow UDF (``operators/parse.py``) realizes the whole
  per-sentence text-parser pipeline of the reference
  (``arekit/common/text/parser.py`` + ``contrib/utils/pipelines/items/text/*``);
  everything after that is declarative DataFrame algebra compiled by Catalyst —
  joins, windows, aggregations. No per-row Python anywhere.
* the relational heart (pair enumeration / filters / dedup,
  reference ``common/opinions/annot/algo/pair_based.py``,
  ``common/opinions/collection.py``) is expressed as equi-joins with pushed
  predicates so Catalyst/AQE pick broadcast vs sort-merge and handle skew.
"""

__version__ = "0.1.0"

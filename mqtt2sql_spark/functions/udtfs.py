"""Python UDTFs (table functions, Spark 4 `udtf` API).

No `from __future__ import annotations` here for the same hint-
resolution reason as functions/udafs.py.
"""

from pyspark.sql.functions import udtf


@udtf(returnType="ancestor string, depth int")
class TopicAncestors:
    """topic 'a/b/c' → rows ('a',1), ('a/b',2), ('a/b/c',3).

    The MQTT subscription-tree expansion as a TABLE FUNCTION: one input
    row yields its full ancestor chain, the generator form of the
    expression-based prefix expansion topic_hierarchy_rollup uses.
    Row-based Python — the deliberate slow-path demo of the UDTF API
    surface; the expression twin remains the production path."""

    def eval(self, topic: str):
        if topic is None:
            return
        parts = topic.split("/")
        for i in range(1, len(parts) + 1):
            yield "/".join(parts[:i]), i

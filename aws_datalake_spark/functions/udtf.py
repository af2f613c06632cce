"""Python UDTF surface (SURVEY.md §2.7 note: the reference's only
table-generating ops are explode/flatten; Spark 4 adds first-class
Python UDTFs for logic built-ins can't express).

The shipped example mirrors operators/text.py:split_sentences so the
test can assert UDTF output == built-in output; real uses are
tokenizers/parsers with library dependencies, run via Arrow batches.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sentence: string")
class SentenceSplit:
    """One row per sentence; same segmentation contract as
    operators/text.py:split_sentences ([.!?]+ runs, trimmed,
    empties dropped)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for piece in re.split(r"[.!?]+", text):
            s = piece.strip()
            if s:
                yield (s,)


def register(spark) -> None:
    spark.udtf.register("sentence_split", SentenceSplit)

"""Fourth text wave: unicode canonicalization and inverted-index
construction — the normalize-then-index steps of a web-scale corpus
pipeline.

- ``text_normalize_unicode`` — NFC normalization + control-character
  strip + whitespace collapse + casefold. The fixture corpus is pure
  ASCII (so NFC alone would be an identity); the query therefore
  appends a deterministic suffix containing DECOMPOSED forms (e + U+0301,
  u + U+0308), a BEL control char, and ragged whitespace, constructed
  identically in both engines (Python ``\\u`` literals ↔ DuckDB
  ``chr()``), so the oracle genuinely checks composition: Spark
  normalizes with a Python ``unicodedata`` pandas UDF, DuckDB with its
  native ``nfc_normalize``. Two independent NFC implementations must
  agree byte-for-byte.
- ``text_inverted_index`` — token → (document frequency, total term
  frequency, head of the sorted posting list). The posting list is the
  core retrieval structure; capping the materialized head keeps output
  rows bounded while the df/tf aggregates still cover every posting.

Scale notes: normalization is embarrassingly parallel (Arrow-batched
pandas UDF, no shuffle). The inverted index is one explode + one
token-keyed aggregation — map-side combine reduces each token to one
partial per input partition, so hot tokens (stopwords) cost a merge of
partials, never a row fan-in; the posting head is collected AFTER a
distinct-per-doc pass so ``collect_set`` state per token is bounded by
df, and the 20-element slice bounds the output row. At 100 TB the same
plan shards by token; only the per-token head strings change size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Decomposed-form suffix: TAB, 'Cafe' + combining acute (U+0301), BEL,
# double space, 'Du' + combining diaeresis (U+0308) + 'sseldorf', CR.
# NFC composes e+U+0301 → é and u+U+0308 → ü.
_MESSY_SUFFIX = "\tCafé \x07  Düsseldorf\r"
_MESSY_SUFFIX_SQL = (
    "chr(9) || 'Cafe' || chr(769) || ' ' || chr(7) || '  Du' || chr(776) "
    "|| 'sseldorf' || chr(13)"
)
# Non-whitespace C0/C1 controls + DEL; whitespace survives until the
# collapse step so control-stripping can't join adjacent words.
_CTRL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

_NORMALIZE_ORACLE = f"""
    WITH messy AS (
        SELECT doc_id, substr(text, 1, 60) || {_MESSY_SUFFIX_SQL} AS raw
        FROM documents
    )
    SELECT doc_id,
           length(raw) AS raw_chars,
           lower(trim(regexp_replace(
               regexp_replace(nfc_normalize(raw), '{_CTRL_RE}', '', 'g'),
               '\\s+', ' ', 'g'))) AS normalized,
           length(lower(trim(regexp_replace(
               regexp_replace(nfc_normalize(raw), '{_CTRL_RE}', '', 'g'),
               '\\s+', ' ', 'g')))) AS norm_chars
    FROM messy
    ORDER BY doc_id
"""


@query("text_normalize_unicode", oracle=_NORMALIZE_ORACLE, tags=("llm", "text", "normalize", "pandas-udf"))
def text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization: NFC-compose, strip non-whitespace
    control chars, collapse runs of whitespace, trim, lowercase. The
    oracle runs DuckDB's native ``nfc_normalize`` against this Python
    ``unicodedata`` kernel — two independent NFC implementations
    checked byte-for-byte (see module docstring for why the decomposed
    input is synthesized)."""
    import re
    import unicodedata

    ctrl = re.compile(_CTRL_RE)
    ws = re.compile(r"\s+")

    @F.pandas_udf("string")
    def nfc_clean(s: pd.Series) -> pd.Series:
        def f(x: str) -> str:
            x = unicodedata.normalize("NFC", x)
            x = ctrl.sub("", x)
            return ws.sub(" ", x).strip().lower()

        return s.map(f)

    d = load_tables(spark, sf_dir)["documents"]
    raw = F.concat(F.substring("text", 1, 60), F.lit(_MESSY_SUFFIX))
    return (
        d.select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            F.length("raw").cast("long").alias("raw_chars"),
            nfc_clean("raw").alias("normalized"),
        )
        .withColumn("norm_chars", F.length("normalized").cast("long"))
        .orderBy("doc_id")
    )


_INVERTED_INDEX_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents
    ),
    per_doc AS (
        SELECT token, doc_id, count(*) AS tf
        FROM tok WHERE token <> '' GROUP BY 1, 2
    )
    SELECT token,
           count(*) AS df,
           CAST(sum(tf) AS BIGINT) AS tf_total,
           array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings_head
    FROM per_doc
    GROUP BY token
    ORDER BY token
"""


@query("text_inverted_index", oracle=_INVERTED_INDEX_ORACLE, tags=("llm", "text", "index"))
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: token → document frequency, corpus term
    frequency, and the first 20 doc_ids of the sorted posting list.
    Two-level aggregation — (token, doc) partials first, then per-token
    merge — so hot tokens aggregate partials instead of raw postings,
    and the posting head is sliced before stringification so the output
    row stays bounded no matter the df."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    return (
        per_doc.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("tf_total"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20), ","
            ).alias("postings_head"),
        )
        .orderBy("token")
    )

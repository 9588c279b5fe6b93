"""Dynamic-schema normalization — the dashboard's defensive coercions
(reference: dashboard/streamlit_app.py:190-246) as one explicit operator.

Parity (SURVEY.md §2.2 P10-P13):

- P10 numeric coercion: ``try_cast`` → null → fill 0 (pandas
  ``to_numeric(errors='coerce').fillna(0)`` semantics)
- P11 timestamp fallback chain: first parseable of
  processing_timestamp / timestamp / created_at, else current time
- P12 missing-column defaulting (constants from streamlit_app.py:203-220)
- P13 hashtag-cell normalization: typed array passes through; a stringified
  list (``"['a', 'b']"``) is re-parsed; scalar string becomes 1-element list;
  null becomes empty list
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import POST_DEFAULTS

# derived, not hand-listed: a numeric default added to POST_DEFAULTS must
# automatically get P10 coercion or string inputs keep their raw type
_NUMERIC_DEFAULTS = {
    k: v
    for k, v in POST_DEFAULTS.items()
    if isinstance(v, (int, float)) and not isinstance(v, bool)
}
_STRING_DEFAULTS = {
    k: v for k, v in POST_DEFAULTS.items() if isinstance(v, str)
}
_TS_CANDIDATES = ["processing_timestamp", "timestamp", "created_at"]


def _normalize_hashtags(df: DataFrame) -> DataFrame:
    if "hashtags" not in df.columns:
        return df.withColumn("hashtags", F.array().cast("array<string>"))
    dt = df.schema["hashtags"].dataType
    if isinstance(dt, T.ArrayType):
        return df.withColumn(
            "hashtags", F.coalesce(F.col("hashtags").cast("array<string>"), F.array().cast("array<string>"))
        )
    # string cell: stringified python list or bare tag. from_json over a
    # naive quote swap corrupts on apostrophes inside tags ("rock'n'roll")
    # and would drop the WHOLE cell; fall back to extracting the quoted
    # spans with BOTH quotes anchored at element delimiters (opening after
    # [ or , ; closing before , or ]), so a tag with interior apostrophes
    # is recovered whole — 'rock'n'roll' yields rock'n'roll, not roll.
    # (?s) lets the tag body span newlines (plain . excludes \n). Known
    # bound: the opening-quote lookbehind tolerates at most 8 whitespace
    # chars after the [ or , — Java lookbehinds must be finite-width, and
    # repr()-style inputs never exceed one space; >8 spaces drops that tag.
    as_str = F.col("hashtags").cast("string")
    parsed = F.from_json(F.regexp_replace(as_str, "'", '"'), "array<string>")
    extracted = F.regexp_extract_all(
        as_str, F.lit(r"(?s)(?<=[\[,]\s{0,8})'(.*?)'(?=\s*[,\]])"), F.lit(1)
    )
    return df.withColumn(
        "hashtags",
        F.when(F.col("hashtags").isNull(), F.array().cast("array<string>"))
        .when(
            as_str.startswith("["),
            F.coalesce(parsed, extracted, F.array().cast("array<string>")),
        )
        .otherwise(F.array(as_str)),
    )


def normalize_posts(df: DataFrame) -> DataFrame:
    """Coerce an untyped/partial post table to the canonical enriched shape."""
    out = df
    # P12: ensure expected columns exist
    for col, default in POST_DEFAULTS.items():
        if col not in out.columns:
            out = out.withColumn(col, F.lit(default))
    # P11: timestamp fallback chain (string parse is try-semantics: bad → null)
    # try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4 default)
    # the latter THROWS on malformed strings; coerce semantics need null.
    ts_exprs = [
        F.try_to_timestamp(F.col(c).cast("string"))
        for c in _TS_CANDIDATES
        if c in out.columns
    ]
    out = out.withColumn("event_ts", F.coalesce(*ts_exprs, F.current_timestamp()))
    # P10: numeric coercion with errors='coerce' → fill default. Coerce
    # through DOUBLE first: a direct string->int try_cast nulls out decimal
    # strings ('3.5') and double-typed inputs (12.0 renders '12.0'), which
    # pandas to_numeric accepts. Integer targets then truncate toward zero
    # ('3.9' → 3, '-3.5' → -3). NOTE the truncation is forced by OUR
    # declared integer schema, not by the reference: streamlit_app.py:246
    # only runs pd.to_numeric(...).fillna(0) and keeps 3.5 as a float —
    # any int cast (round or truncate) diverges from the reference for
    # decimal strings in an integer column. Truncation (pandas astype(int)
    # semantics) is the documented choice.
    for col, default in _NUMERIC_DEFAULTS.items():
        as_num = F.col(col).cast("string").try_cast("double")
        coerced = as_num if isinstance(default, float) else as_num.try_cast("int")
        out = out.withColumn(col, F.coalesce(coerced, F.lit(default)))
    # string defaults for nulls
    out = out.na.fill(_STRING_DEFAULTS)
    # P13
    out = _normalize_hashtags(out)
    return out

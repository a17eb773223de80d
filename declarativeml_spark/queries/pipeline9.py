"""Training-data pipeline operators, part 9 (round 5).

* ``tokenizer_bpe_merges`` — BPE-merge tokenizer TRAINING over the
  document corpus (operators/bpe.py): iterative most-frequent-pair
  selection with exact greedy left-to-right application, the missing
  learn-side counterpart of ``tokenizer_fertility``. Also reachable
  as the DSL statement ``TRAIN TOKENIZER <name> FROM <source>
  VOCAB n``.

Float conventions follow registry.py; this module's outputs are
exact integers and strings, so hash parity needs no rounding at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from declarativeml_spark.operators.bpe import (
    bpe_compression_curve,
    bpe_curve_oracle_sql,
    bpe_merges,
    bpe_merges_oracle_sql,
)
from declarativeml_spark.queries.registry import query
from declarativeml_spark.sources.catalog import load_table

_BPE_ROUNDS = 6


@query("tokenizer_bpe_merges", oracle=bpe_merges_oracle_sql(_BPE_ROUNDS))
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first <_BPE_ROUNDS> BPE merge rules from the document
    corpus: collapse to word types once, then per round count adjacent
    symbol pairs (weighted by word frequency), take the global top
    pair (ties by pair text), and apply it greedily left-to-right.

    Scale: the corpus shuffles ONCE (the word-type count); every
    round after that runs on the vocabulary — a dimension-sized frame
    at any corpus size — with a map-side-combinable pair agg, a
    TakeOrdered top-1, and a codegen'd per-row fold. Rounds
    persist-and-release generation by generation, so storage holds
    one vocabulary frame regardless of round count. Even the learned
    rules are hash-checked against DuckDB running the identical
    greedy fold.
    """
    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges(docs, "text", _BPE_ROUNDS)


@query("tokenizer_bpe_curve", oracle=bpe_curve_oracle_sql(_BPE_ROUNDS))
def tokenizer_bpe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression curve of BPE training: after each learned merge
    (generation 0 = raw characters), the corpus's total token count
    (word types weighted by frequency) and the symbol-vocabulary size
    — the tokens-saved-per-vocab-slot trade a tokenizer budget
    decision reads, produced in-engine next to the learned rules.

    Scale: identical loop shape to tokenizer_bpe_merges (one
    corpus-sized word-type shuffle, then vocabulary-sized rounds);
    the curve adds two bounded aggs per generation (a 1-row total and
    a distinct-symbol count). Exact integers end to end, hash-checked
    against DuckDB replaying the same greedy folds.
    """
    docs = load_table(spark, sf_dir, "documents")
    return bpe_compression_curve(docs, "text", _BPE_ROUNDS)

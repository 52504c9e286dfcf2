"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

A crawl engine's downstream customer is a tokenizer: the corpus the
frontier fetches is exactly the corpus a BPE vocabulary is trained on.
At 100 TB the training input is too large for the single-process
trainers (HuggingFace `tokenizers`, sentencepiece) — but the classic
algorithm distributes cleanly because it only ever touches the
*distinct-word frequency table* (Heaps' law: ~10^8-10^9 rows for a
100 TB corpus — a small Spark table), never the raw corpus:

  1. one corpus pass builds ``(word, freq)``            — explode + groupBy,
                                                           map-side combined
  2. per merge step: adjacent-symbol-pair counts         — array HOF +
                                                           explode + groupBy(sum),
                                                           map-side combined
  3. argmax pair                                         — orderBy().limit(1),
                                                           a 1-row collect
  4. apply the merge to every word                       — one vectorized
                                                           regexp_replace (JVM,
                                                           whole-stage codegen)

Nothing but (pair, count) rows ever shuffles; the word table is
rewritten once per merge (inherent to BPE — every distributed
implementation does this) with ``localCheckpoint`` cutting the lineage
so the plan stays O(1) per step instead of O(n_merges).

Word symbol state is kept as a separator-joined string
``SEP a SEP b SEP ... SEP`` rather than an array so the merge step is a
single ``regexp_replace`` with lookaround anchors::

    (?<=SEP) a SEP b (?=SEP)   ->   ab

The lookarounds do NOT consume the shared separators, so consecutive
occurrences merge exactly like the reference algorithm's left-to-right
non-overlapping pass (``a a a a`` + merge(a,a) -> ``aa aa``;
``a a a`` -> ``aa a``). Tie-breaking at the argmax is deterministic:
(count DESC, left ASC, right ASC) — pinned in both this trainer and the
pure-Python reference in tests/test_bpe.py, so learned merge lists are
comparable bit-for-bit.

Reference tie-in: /root/reference/text_chunking.py tokenizes with
``text.split()`` (whitespace) before chunking; this operator is the
web-scale continuation — learn the subword vocabulary from the crawled
corpus itself. Paper: Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016), Algorithm 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens

# Unit separator: cannot appear in whitespace-split tokens of the
# corpus (it IS whitespace-adjacent control, but tokens() splits on
# \s+ which does not include \x1f — enforced by _clean below).
SEP = "\x1f"

_RX_META = set("\\^$.|?*+()[]{}")


def _rx_quote(s: str) -> str:
    """Escape a symbol for embedding in a Java regex pattern."""
    return "".join("\\" + c if c in _RX_META else c for c in s)


def _repl_quote(s: str) -> str:
    """Escape a symbol for a Java regex replacement string."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table from a corpus: (word, freq).

    The ONLY full-corpus pass in BPE training; map-side combined
    groupBy, output is Heaps-law sized (sublinear in corpus bytes).
    Words containing SEP are dropped (cannot be represented in the
    joined-symbol state; never produced by whitespace tokenization of
    text content).
    """
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _with_repr(words: DataFrame) -> DataFrame:
    # SEP-wrapped single-char symbol state: "abc" -> "\x1fa\x1fb\x1fc\x1f"
    return words.withColumn(
        "repr", F.concat(F.regexp_replace(F.col("word"), "(.)", SEP + "$1"), F.lit(SEP))
    )


def _pair_counts(words_repr: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-symbol pair counts weighted by word freq.

    Array HOFs only — the per-word pair list never leaves the map side
    before the combining groupBy. Overlapping identical pairs count
    once per position ("aaa" -> (a,a) twice), matching the reference
    algorithm's get_stats.
    """
    syms = F.filter(F.split(F.col("repr"), SEP), lambda x: x != "")
    w = words_repr.withColumn("syms", syms).filter(F.size("syms") >= 2)
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
    )
    return (
        w.select("freq", F.explode(pairs).alias("p"))
        .select("freq", "p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("n"))
    )


def merge_expr(col, a: str, b: str):
    """The vectorized merge: one regexp_replace applying merge (a, b).

    Lookaround-anchored so shared separators survive for the next
    occurrence (exact left-to-right non-overlapping semantics).
    """
    pat = f"(?<={SEP}){_rx_quote(a)}{SEP}{_rx_quote(b)}(?={SEP})"
    return F.regexp_replace(col, pat, _repl_quote(a + b))


def train_bpe(
    words: DataFrame,
    n_merges: int,
    min_count: int = 2,
    checkpoint_every: int = 1,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table.

    Returns (merges, final_words) where final_words carries
    (word, freq, syms: array<string>) — the post-merge symbol sequence
    per word. Stops early when no pair reaches ``min_count``.

    Per step: one shuffle (pair-count groupBy, map-side combined), one
    1-row collect (the argmax), one narrow map (the regexp merge).
    ``localCheckpoint`` every ``checkpoint_every`` steps keeps the plan
    depth constant — without it the analyzed plan grows one
    regexp_replace per merge and driver planning time dominates.
    """
    w = _with_repr(words).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(w)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        w = w.withColumn("repr", merge_expr(F.col("repr"), a, b))
        if (step + 1) % checkpoint_every == 0:
            w = w.localCheckpoint()
    out = w.withColumn(
        "syms", F.filter(F.split(F.col("repr"), SEP), lambda x: x != "")
    ).drop("repr")
    return merges, out


def apply_bpe(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Encode a (word, ...) table with a learned merge list.

    Folds the merge list into one nested column expression (n_merges
    regexp_replace calls, all JVM-side, one narrow stage — no shuffle,
    no Python). Adds ``syms: array<string>``.
    """
    w = _with_repr(words)
    expr = F.col("repr")
    for a, b in merges:
        expr = merge_expr(expr, a, b)
    return (
        w.withColumn("repr", expr)
        .withColumn("syms", F.filter(F.split(F.col("repr"), SEP), lambda x: x != ""))
        .drop("repr")
    )


def encode_corpus(docs: DataFrame, merges: list[tuple[str, str]],
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Tokenize a document corpus with a learned merge list — the
    APPLY side of the trainer, and the step that turns crawled pages
    into training-ready token sequences (feed the output to
    ``seq_pack``'s token budgeting).

    The corpus is never re-encoded row by row: encoding a word depends
    only on the word, so the DISTINCT word table (Heaps' law: ~10^8-9
    rows at 100 TB, vs ~10^13 token occurrences) is encoded once via
    ``apply_bpe``'s vectorized regexp fold and joined back on the word
    key — the same move the trainer itself lives on. Positions ride the
    explode so per-document token order is exact; reassembly is the
    bounded collect pattern (one document's tokens).

    Returns (id_col, n_words, n_tokens, tokens: array<string>) — token
    IDs are one broadcast vocab join away and deliberately not minted
    here (the vocab table owns the id space)."""
    w = F.col("_w")
    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("_pos", "_w"))
    words = apply_bpe(toks.select(w.alias("word")).distinct(), merges)
    joined = toks.join(words, toks["_w"] == words["word"]).select(
        id_col, "_pos", "syms")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "syms"))),
                lambda s: s.syms)).alias("tokens"),
    )
    return per_doc.select(
        id_col, "n_words",
        F.size("tokens").cast("long").alias("n_tokens"), "tokens")

"""U1-U3: AI-agent strategy surface, deterministically reproduced.

* ``analyze_website`` (reference ai_agent.py:98-174): the reference's
  regex parser references ``re`` without importing it, so the LLM path
  ALWAYS NameErrors into the default CrawlStrategy (SURVEY Appendix A
  #1) — the de-facto semantics are deterministic and reproduced here
  exactly: depth 2, pages 10, bfs, pruning filter at 0.48.
* ``apply_strategy`` (crawl_agent.py:490-524): strategy rewrites the
  CrawlConfig; focus keywords force Best-First (crawl_agent.py:503-506).
* ``enhance_content`` / ``answer_question`` (U2/U3, ai_agent.py:176-267):
  nondeterministic LLM stages — pluggable mapInPandas hooks, stubbed
  behind NotImplementedError unless a model callable is injected; the
  reference's input truncation (10k/15k chars) is applied Spark-side so
  the plumbing is real.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import CrawlConfig


@dataclass(frozen=True)
class CrawlStrategy:
    """Default mirrors the reference's CrawlStrategy defaults
    (ai_agent.py:73-83)."""

    max_depth: int = 2
    max_pages: int = 10
    strategy_type: str = "bfs"
    content_filter_type: str = "pruning"
    threshold: float = 0.48
    focus_keywords: tuple[str, ...] = ()


def analyze_website(url: str, use_llm: bool = False) -> CrawlStrategy:
    """Always the default strategy: the reference's response parser dies
    on a missing ``re`` import and its handler returns the default
    (ai_agent.py:149,172-174) — so even with an LLM configured, this IS
    the reference's observable behavior."""
    return CrawlStrategy()


def apply_strategy(cfg: CrawlConfig, strat: CrawlStrategy) -> CrawlConfig:
    """Rewrite the job config from an analysis result
    (crawl_agent.py:490-524): keywords force best_first + scorer query."""
    strategy = "best_first" if strat.focus_keywords else strat.strategy_type
    return replace(
        cfg,
        strategy=strategy,
        max_depth=strat.max_depth,
        max_pages=strat.max_pages,
        query=" ".join(strat.focus_keywords) if strat.focus_keywords else cfg.query,
        use_ai_agent=True,
    )


ENHANCE_TRUNCATE = 10_000   # ai_agent.py:187
ANSWER_TRUNCATE = 15_000    # ai_agent.py:252


def enhance_content(df: DataFrame, text_col: str = "markdown", model=None) -> DataFrame:
    """U2: optional LLM rewrite stage. The truncation and Arrow plumbing
    are real; the model call is the stub boundary."""
    truncated = df.withColumn("_in", F.substring(F.col(text_col), 1, ENHANCE_TRUNCATE))
    if model is None:
        raise NotImplementedError(
            "enhance_content needs an injected model callable (no LLM in sandbox)"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def run(texts: pd.Series) -> pd.Series:
        return pd.Series([model(t) for t in texts])

    return truncated.withColumn("enhanced", run(F.col("_in"))).drop("_in")


def answer_question(df: DataFrame, question: str, text_col: str = "markdown", model=None) -> DataFrame:
    """U3: QA over truncated page context — same stub boundary."""
    truncated = df.withColumn("_ctx", F.substring(F.col(text_col), 1, ANSWER_TRUNCATE))
    if model is None:
        raise NotImplementedError(
            "answer_question needs an injected model callable (no LLM in sandbox)"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def run(ctxs: pd.Series) -> pd.Series:
        return pd.Series([model(question, c) for c in ctxs])

    return truncated.withColumn("answer", run(F.col("_ctx"))).drop("_ctx")

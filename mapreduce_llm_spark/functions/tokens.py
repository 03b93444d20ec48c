"""Token counting and the model cost table.

Mirrors the reference's estimation surface (reference
internal/cli/estimation.go:13-36 — cl100k_base token count; :39-44 —
the 4-model input-cost table, kept verbatim below).

tiktoken is not available in this container, so ``count_tokens`` uses a
deterministic BPE-ish approximation when the import fails: each
whitespace-delimited word contributes max(1, ceil(len/4)) tokens
(≈4 chars per BPE token, the published cl100k rule of thumb);
punctuation is counted as part of the word it touches, not separately
— this word-only rule is what token_count_col and the _DUCK_TOKENS
oracle implement, so all three stay in lockstep. The implementation is
vectorized (operates on whole pandas Series) so the Spark pandas-UDF
path ships Arrow batches, never single rows.
"""

from __future__ import annotations

import math
import re

import pandas as pd

try:  # pragma: no cover - container has no tiktoken
    import tiktoken

    _ENC = tiktoken.get_encoding("cl100k_base")
except Exception:  # ImportError or download failure
    _ENC = None

# chars-per-token heuristic used when tiktoken is absent
_CHARS_PER_TOKEN = 4
_WORD_RE = re.compile(r"\S+")


# Plug-in seam: a caller-supplied encoder takes precedence over both
# tiktoken and the heuristic, so a real cl100k (or any other) encoder
# can be dropped in without code changes — e.g. a vendored pure-Python
# BPE, or tiktoken installed outside this container. The callable maps
# str -> token count.
_CUSTOM_COUNTER = None


def set_token_counter(counter) -> None:
    """Install (or with None, remove) a custom ``str -> int`` token
    counter. Overrides tiktoken and the heuristic for every consumer:
    count_tokens_str, the pandas UDF, chunking, and cost estimation.

    NOTE: the installed callable is captured by Spark UDF closures, so
    it must be picklable (a module-level function, not a lambda holding
    unpicklable state) when used in distributed paths."""
    global _CUSTOM_COUNTER
    _CUSTOM_COUNTER = counter


def count_tokens_str(text: str) -> int:
    """Token count of one string (custom counter if installed, exact
    via tiktoken when present, deterministic approximation otherwise)."""
    if _CUSTOM_COUNTER is not None:
        return _CUSTOM_COUNTER(text)
    if _ENC is not None:
        return len(_ENC.encode(text))
    if not text:
        return 0
    n = 0
    for w in _WORD_RE.findall(text):
        n += max(1, math.ceil(len(w) / _CHARS_PER_TOKEN))
    return n


def count_tokens_series(texts: pd.Series) -> pd.Series:
    """Vectorized token count for a pandas Series of strings."""
    return texts.fillna("").map(count_tokens_str).astype("int64")


def make_count_tokens_udf():
    """Build the Arrow-vectorized pandas UDF (session must exist)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def count_tokens(texts: pd.Series) -> pd.Series:
        return count_tokens_series(texts)

    return count_tokens


# Input cost per 1M tokens — the reference's table verbatim
# (reference internal/cli/estimation.go:39-44).
MODEL_COSTS_PER_1M_INPUT_TOKENS: dict[str, float] = {
    "gpt-5-nano": 0.05,
    "gpt-5-mini": 0.25,
    "gpt-5": 1.25,
    "gpt-5.1": 1.25,
}

DEFAULT_MODEL = "gpt-5-nano"  # reference cmd/cli/root.go:22


def estimate_cost_usd(n_tokens: int, model: str) -> float:
    """tokens × $/1M for one model (reference internal/cli/estimation.go:27-31)."""
    return n_tokens * MODEL_COSTS_PER_1M_INPUT_TOKENS[model] / 1_000_000.0

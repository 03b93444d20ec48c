"""The LLM map — the "map" of the reference's MapReduce.

Reference behavior being re-expressed (not ported):
- prompt augmentation: the user prompt is suffixed with the hardwired
  reduce contract "\\nReturn the lines that you want to keep."
  (reference internal/cli/mapreduce.go:91);
- per-chunk chat call: system = augmented prompt, user = chunk text,
  first choice's content is the result; an empty response is an error
  (reference internal/cli/mapreduce.go:169-196);
- the client is injectable so tests run a deterministic fake
  (reference internal/openai/chat.go:13-16, mapreduce_test.go:17-54).

Spark shape: ``mapInPandas`` over the chunk table. Parallelism is the
partition count — bounded and tunable via repartition(n), a deliberate
improvement over the reference's unbounded goroutine-per-chunk fan-out
(reference internal/cli/mapreduce.go:93-122). Clients must be small and
picklable; they are constructed once per partition, not per row.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame

RETURN_LINES_SUFFIX = "\nReturn the lines that you want to keep."


class ChatClient(Protocol):
    """Minimal chat interface (the reference's ChatGenerator seam)."""

    def generate(self, system: str, user: str) -> str: ...


@dataclass(frozen=True)
class FakeChatClient:
    """Deterministic test client: keeps lines matching a regex.

    Mimics the reference's shipped example — a semantic filter prompt
    ("select the lines with reviews that are about objects from the
    kitchen", reference examples/product-ratings/prompt.txt:1) — with a
    keyword filter so tests are reproducible without a network.
    """

    keep_pattern: str = ""

    def generate(self, system: str, user: str) -> str:
        if not self.keep_pattern:
            return user  # echo
        rx = re.compile(self.keep_pattern)
        return "\n".join(line for line in user.split("\n") if rx.search(line))


@dataclass(frozen=True)
class FailingChatClient:
    """Raises on every call — for error-propagation and cache tests
    (the reference's mock error injection, mapreduce_test.go:234-260)."""

    message: str = "simulated API error"

    def generate(self, system: str, user: str) -> str:
        raise RuntimeError(self.message)


@dataclass(frozen=True)
class OpenAICompatClient:
    """OpenAI-compatible HTTP client (chat completions).

    Built on stdlib urllib against the public /v1/chat/completions
    shape; requires an explicit base_url + api_key. Not exercised in
    tests (no network in this environment) — the seam exists so a real
    deployment can drop it in where tests use FakeChatClient.
    """

    base_url: str
    api_key: str
    model: str = "gpt-5-nano"
    timeout_s: float = 300.0  # reference internal/openai/client.go:30 (5 min)

    def generate(self, system: str, user: str) -> str:
        import json
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url.rstrip('/')}/v1/chat/completions",
            data=json.dumps(
                {
                    "model": self.model,
                    "messages": [
                        {"role": "system", "content": system},
                        {"role": "user", "content": user},
                    ],
                }
            ).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read())
        content = payload["choices"][0]["message"]["content"]
        if not content:
            # reference internal/cli/mapreduce.go:196: empty response is an error
            raise RuntimeError("empty response from chat API")
        return content


RESULT_SCHEMA = "doc_id long, chunk_id long, chunk_text string, result string"


def llm_map(
    chunks: DataFrame,
    prompt: str,
    client: ChatClient,
    concurrency: int | None = None,
) -> DataFrame:
    """Map each chunk through the LLM: adds a ``result`` column.

    ``concurrency`` bounds simultaneous in-flight calls by
    repartitioning (each partition runs one client loop). At cluster
    scale this is the rate limiter the reference lacks.
    """
    system_prompt = prompt + RETURN_LINES_SUFFIX

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [
                client.generate(system_prompt, chunk) for chunk in pdf["chunk_text"]
            ]
            yield pdf.assign(result=results)[
                ["doc_id", "chunk_id", "chunk_text", "result"]
            ]

    src = chunks.select("doc_id", "chunk_id", "chunk_text")
    if concurrency is not None:
        src = src.repartition(concurrency)
    return src.mapInPandas(run, schema=RESULT_SCHEMA)


@dataclass
class RetryingClient:
    """Bounded-retry decorator over any ChatClient (exponential
    backoff). The reference fails the whole job on the first chunk
    error (internal/cli/mapreduce.go:124-127); at cluster scale a
    transient 429/5xx on one chunk must not kill a million-chunk job —
    retries absorb transients, and only a persistent failure
    propagates (Spark then retries the task, then fails the job).

    ``sleep`` is injectable so tests run without wall-clock waits.
    """

    inner: ChatClient
    max_attempts: int = 3
    backoff_s: float = 1.0
    backoff_multiplier: float = 2.0
    sleep: "object" = None  # Callable[[float], None]; None → time.sleep

    def generate(self, system: str, user: str) -> str:
        import time as _time

        do_sleep = self.sleep or _time.sleep
        delay = self.backoff_s
        last: Exception | None = None
        for attempt in range(1, self.max_attempts + 1):
            try:
                return self.inner.generate(system, user)
            except Exception as ex:  # noqa: BLE001 — transport errors vary by client
                last = ex
                if attempt == self.max_attempts:
                    break
                do_sleep(delay)
                delay *= self.backoff_multiplier
        raise RuntimeError(
            f"chat call failed after {self.max_attempts} attempts: {last}"
        ) from last


@dataclass
class RateLimitedClient:
    """Token-bucket rate limit decorator: at most ``max_per_second``
    calls per second per client instance (i.e. per Python worker —
    cluster-wide rate ≈ max_per_second × concurrency, so set
    ``llm_map(concurrency=n)`` and this together to hit a provider
    quota exactly). ``clock``/``sleep`` are injectable for tests."""

    inner: ChatClient
    max_per_second: float = 1.0
    clock: "object" = None  # Callable[[], float]; None → time.monotonic
    sleep: "object" = None

    def __post_init__(self) -> None:
        self._next_allowed = 0.0

    def generate(self, system: str, user: str) -> str:
        import time as _time

        now_fn = self.clock or _time.monotonic
        do_sleep = self.sleep or _time.sleep
        now = now_fn()
        if now < self._next_allowed:
            do_sleep(self._next_allowed - now)
            now = self._next_allowed
        self._next_allowed = now + 1.0 / self.max_per_second
        return self.inner.generate(system, user)

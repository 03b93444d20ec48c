"""CLI entry — the reference's ``mapred-llm <prompt> <data-file-path>``
(reference cmd/cli/root.go:11-27) as a thin wrapper over the library.

Differences, all deliberate: model/budget are flags instead of
hardwired; the interactive confirm gate is ``--dry-run`` (reference
internal/cli/mapreduce.go:53-65 — Spark jobs aren't TTY-bound); with no
OPENAI_API_KEY/OPENAI_BASE_URL the deterministic FakeChatClient runs
(``--keep-pattern``) so the pipeline is usable offline.

Usage:
    python -m mapreduce_llm_spark.cli "<prompt>" <file> [--dry-run]
        [--model gpt-5-nano] [--max-tokens 2000] [--cache-dir DIR]
        [--keep-pattern REGEX] [-o OUT]
"""

from __future__ import annotations

import argparse
import os
import sys

from mapreduce_llm_spark.functions.tokens import DEFAULT_MODEL
from mapreduce_llm_spark.operators.chunker import DEFAULT_MAX_TOKENS_PER_CHUNK


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mapreduce-llm-spark",
        description="MapReduce-style LLM processing of a text file on Spark",
    )
    p.add_argument("prompt")
    p.add_argument("data_file_path")
    p.add_argument("--model", default=DEFAULT_MODEL)
    p.add_argument("--max-tokens", type=int, default=DEFAULT_MAX_TOKENS_PER_CHUNK)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--keep-pattern", default="", help="fake-client line filter regex")
    p.add_argument("-o", "--output", default=None, help="output file (default: <file>.combined_results.txt)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not os.path.isfile(args.data_file_path):
        print(f"error: no such file: {args.data_file_path}", file=sys.stderr)
        return 2

    from mapreduce_llm_spark.operators.llm_map import FakeChatClient, OpenAICompatClient
    from mapreduce_llm_spark.operators.pipeline import process_text
    from mapreduce_llm_spark.session import get_spark

    api_key = os.environ.get("OPENAI_API_KEY")
    base_url = os.environ.get("OPENAI_BASE_URL", "https://api.openai.com")
    client = (
        OpenAICompatClient(base_url=base_url, api_key=api_key, model=args.model)
        if api_key
        else FakeChatClient(args.keep_pattern)
    )

    spark = get_spark(app_name="mapreduce-llm-spark-cli")
    text = open(args.data_file_path, encoding="utf-8").read()

    if args.dry_run:
        est = process_text(
            spark, text, args.prompt, client,
            max_tokens_per_chunk=args.max_tokens, dry_run=True,
        )
        print(f"Tokens: {est.n_tokens}\nChunks: {est.n_chunks}")
        for model, cost in sorted(est.cost_usd_by_model.items()):
            print(f"  {model}: ${cost:.6f}")
        return 0

    result = process_text(
        spark, text, args.prompt, client,
        model=args.model,
        max_tokens_per_chunk=args.max_tokens,
        cache_dir=args.cache_dir,
    )
    # reference writes <base>.combined_results.txt (mapreduce.go:139-146)
    out_path = args.output or f"{os.path.splitext(args.data_file_path)[0]}.combined_results.txt"
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(result)
    print(f"wrote {out_path} ({len(result)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

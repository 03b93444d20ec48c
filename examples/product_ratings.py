"""Runnable parity example for the reference's shipped use case
(reference examples/product-ratings + README.md:55): semantically
filter product reviews down to the ones about kitchen objects.

The reference does this with `mapred-llm "<prompt>" reviews.txt` and a
real OpenAI call; here the same pipeline — read lines → token-bounded
chunks → LLM map → ordered reduce → text sink — runs through the
engine with the deterministic FakeChatClient, so the example executes
offline and reproducibly. Swap in OpenAICompatClient (operators/
llm_map.py) for a real model.

Run:  python examples/product_ratings.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_llm_spark.io import read_text_document
from mapreduce_llm_spark.operators.llm_map import FakeChatClient
from mapreduce_llm_spark.operators.pipeline import semantic_filter, write_text_sink
from mapreduce_llm_spark.session import get_spark

# Our own synthetic corpus (the reference ships a similar-shaped
# reviews.txt; we generate ours so the example is self-contained).
KITCHEN = [
    "The blender crushes ice without waking the neighbours.",
    "This saucepan heats evenly and cleans up in seconds.",
    "The coffee maker gurgles politely and brews a sharp espresso.",
    "A toaster that actually toasts both sides — revolutionary.",
]
OTHER = [
    "The novel starts slow but the ending lands well.",
    "These headphones leak sound like a sieve.",
    "The jacket shrugs off rain and looks sharp doing it.",
    "My desk lamp flickers whenever the cat sneezes.",
]


def main() -> None:
    spark = get_spark(app_name="example-product-ratings")
    with tempfile.TemporaryDirectory() as tmp:
        reviews_path = os.path.join(tmp, "reviews.txt")
        lines = [l for pair in zip(KITCHEN, OTHER) for l in pair]
        with open(reviews_path, "w") as f:
            f.write("\n".join(lines))

        docs = read_text_document(spark, reviews_path)
        client = FakeChatClient(
            keep_pattern=r"(?i)blender|saucepan|coffee|toast|kitchen|pan\b"
        )
        kept = semantic_filter(
            docs,
            "Please select the lines with reviews that are about objects "
            "from the kitchen.",
            client,
        )

        out_dir = os.path.join(tmp, "reviews.combined_results.txt")
        write_text_sink(kept, out_dir)  # Spark text sink: a dir with one part file
        part = next(
            f for f in sorted(os.listdir(out_dir)) if f.startswith("part-")
        )
        with open(os.path.join(out_dir, part)) as f:
            result = f.read()

    print("=== kept lines ===")
    print(result)
    n_kept = len([l for l in result.splitlines() if l.strip()])
    assert n_kept == len(KITCHEN), f"expected {len(KITCHEN)} kitchen lines, got {n_kept}"
    print(f"OK: {n_kept}/{len(lines)} lines kept")


if __name__ == "__main__":
    main()

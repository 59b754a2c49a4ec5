#!/usr/bin/env python3
"""Generate a ZIPF-vocabulary documents fixture for the blocking-curve
measurement (VERDICT r10 #7, re-cut per VERDICT r11 #1).

Driver-side tooling only (like check.py) — the Scala library never
reads this script. The r11 fixture mimicked the driver generator's
31-word uniform vocabulary; at 50k docs that makes essentially every
3-gram exceed the q91/q216 df-cap, so the measured candidate volume
COLLAPSED to a 3.7k-pair rare tail — proving cap saturation, not the
claimed ~linear rare-tail growth. This cut draws tokens from a
~50,000-type Zipf(s = 1.07) distribution (the classic rank-frequency
law of real text, Zipf 1949): the head recreates the stopword-class
grams the df-cap must prune, while the long tail supplies rare grams
whose count — and therefore the df-capped families' candidate
volume — grows roughly linearly with corpus size, the regime the
100 TB claim is about.

Structure kept from the r11 fixture (matching the driver generator's
observable shape): doc length ~ U(8, 100) words, 20 sources, 5 langs,
5% of docs planted as near-duplicates (an earlier doc's text with a
" dup" marker appended) — what the dedup blocking families
(q184/q185/q91/q216) key on.

Usage: python3 tools/gen_sf1.py <outDir> [nDocs]
Writes <outDir>/documents.parquet. Default nDocs = 50000 (10x sf0.1).
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_TYPES = 50000
ZIPF_S = 1.07
LANGS = ["en", "de", "es", "fr", "zh"]


def main() -> None:
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(1, VOCAB_TYPES + 1)]
    weights = [1.0 / (r ** ZIPF_S) for r in range(1, VOCAB_TYPES + 1)]
    cum = []
    acc = 0.0
    for w in weights:
        acc += w
        cum.append(acc)
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            text = texts[rng.randrange(i)] + " dup"
            # strip a previous dup marker so chains stay pairwise
            text = text.replace(" dup dup", " dup")
        else:
            nw = rng.randint(8, 100)
            text = " ".join(
                rng.choices(vocab, cum_weights=cum, k=nw))
        ids.append(i)
        texts.append(text)
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
        nchars.append(len(text))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(nchars, pa.int64()),
    })
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(t, f"{out}/documents.parquet")
    print(f"wrote {n} docs to {out}/documents.parquet")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate an sf1-scale documents fixture for the blocking-curve
measurement (VERDICT r10 #7).

Driver-side tooling only (like check.py) — the Scala library never
reads this script. The fixture mimics the driver generator's
observable statistics at sf0.01/sf0.1 (inspected, not copied): 31-word
vocabulary, uniform word draws, doc length ~ U(8, 100) words, 20
sources, 5 langs, and 5% of docs planted as near-duplicates (an
earlier doc's text with a " dup" marker appended) — the structure the
dedup blocking families (q184/q185/q91/q216) key on.

Usage: python3 tools/gen_sf1.py <outDir> [nDocs]
Writes <outDir>/documents.parquet. Default nDocs = 50000 (10x sf0.1).
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("key fast line the vector value column query group spark part "
         "order window sort a stream table row filter merge customer big "
         "hash slow join data agg scan small batch").split()
LANGS = ["en", "de", "es", "fr", "zh"]


def main() -> None:
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    rng = random.Random(42)
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            text = texts[rng.randrange(i)] + " dup"
            # strip a previous dup marker so chains stay pairwise
            text = text.replace(" dup dup", " dup")
        else:
            nw = rng.randint(8, 100)
            text = " ".join(rng.choice(VOCAB) for _ in range(nw))
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

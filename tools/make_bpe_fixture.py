#!/usr/bin/env python3
"""Learn the committed BPE fixture (GPT-2 merges.txt format + BERT
vocab.txt format) from the sf0.01 documents corpus.

Classic BPE learning (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016): start from characters, then
repeatedly merge the most frequent adjacent symbol pair across the
word-frequency table. Deterministic by construction: ties break to the
lexicographically smallest (left, right) pair, so re-running this
script on the same corpus reproduces the fixture byte-for-byte.

The learned table satisfies the BPE invariant the engine checks at
load time (every multi-char constituent of merge i was produced by an
earlier merge), which is what makes greedy leftmost-pair encoding
equivalent to the reference all-occurrences algorithm (see
functions/Bpe.scala).

Run once; the fixture rides the repo:
    python3 tools/make_bpe_fixture.py
"""
import collections
import string

import duckdb

# capped BELOW saturation (the corpus fully merges at 89): partially
# merged words keep intermediate tokens observable, so the oracle can
# see (and falsify) the merge PATH, not just the fixed point
N_MERGES = 60
CORPUS = "/root/testdata/sf0.01/documents.parquet"
OUT_DIR = "src/main/resources/graft/bpe"

rows = duckdb.sql(
    f"""SELECT t, count(*) AS c FROM (
          SELECT unnest(list_filter(
            string_split(lower(trim(text)), ' '), x -> len(x) > 0)) AS t
          FROM '{CORPUS}') GROUP BY 1 ORDER BY 1""").fetchall()
words = {tuple(w): int(c) for w, c in rows}

merges = []
for _ in range(N_MERGES):
    pairs = collections.Counter()
    for w, c in words.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += c
    if not pairs:
        break
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    merges.append(best)
    merged = {}
    for w, c in words.items():
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                out.append(w[i] + w[i + 1])
                i += 2
            else:
                out.append(w[i])
                i += 1
        merged[tuple(out)] = merged.get(tuple(out), 0) + c
    words = merged

with open(f"{OUT_DIR}/merges.txt", "w") as f:
    f.write("#version: 0.2\n")
    for a, b in merges:
        f.write(f"{a} {b}\n")

# vocab: printable-ASCII base alphabet (sans whitespace) in codepoint
# order, then merge products in rank order (first occurrence wins)
base = [ch for ch in map(chr, range(33, 127))]
vocab, seen = [], set()
for tok in base + [a + b for a, b in merges]:
    if tok not in seen:
        seen.add(tok)
        vocab.append(tok)
with open(f"{OUT_DIR}/vocab.txt", "w") as f:
    f.write("\n".join(vocab) + "\n")

print(f"{len(merges)} merges, {len(vocab)} vocab entries")

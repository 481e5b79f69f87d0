#!/usr/bin/env python3
"""Generate the BPE tokenizer fixture triple under fixtures/:

  bpe_merges.parquet   (rank int64, left, right)  — the merge table, the
                       published GPT-2 merges.txt format reduced to its
                       columns: one merge rule per row, priority = rank
                       ascending (lower rank merges first)
  bpe_docs.parquet     (doc_id int64, text)       — a small fixed corpus
  bpe_expected.parquet (doc_id int64, n_tokens int64, tokens_str)
                       — the INDEPENDENT Python encoder's answer, the
                       oracle q167 is graded against

The merge table is TRAINED here with textbook BPE (count adjacent
symbol pairs across the corpus vocabulary, merge the most frequent,
ties broken lexicographically for determinism), so it is a real learned
table, not hand noise — OOV words and partially-mergeable words occur
naturally in the doc set.

Encoding semantics (the contract the Scala expression must match, both
sides of which are implemented independently):
  - words = text.split() (any whitespace runs, empties discarded)
  - a word starts as its Unicode code points
  - loop: find the adjacent pair with the LOWEST rank present in the
    word; merge ALL its occurrences leftmost-greedy; repeat until no
    adjacent pair is in the table
  - the document's tokens are the concatenation of its words' tokens

Deterministic: fixed corpus, fixed tie-breaks, no RNG. Re-running
reproduces the committed fixtures byte-for-byte.
"""
import collections

import pyarrow as pa
import pyarrow.parquet as pq

TRAIN_CORPUS = """the quick brown fox jumps over the lazy dog
the lazy dog sleeps under the brown tree
a quick brown dog jumps over a lazy fox
low lower lowest new newer newest
the newest lower tree under the quick fox
wider wide widest new lower under over
""".split()

N_MERGES = 40


def train_merges(words, n_merges):
    """Textbook BPE training over the word list (each occurrence counts)."""
    seqs = [[c for c in w] for w in words]
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += 1
        if not pairs:
            break
        # most frequent; ties broken lexicographically (deterministic)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        merged = l + r
        for s in seqs:
            j, out = 0, []
            while j < len(s):
                if j < len(s) - 1 and s[j] == l and s[j + 1] == r:
                    out.append(merged)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s[:] = out
    return merges


def encode_word(word, ranks):
    parts = [c for c in word]
    while len(parts) >= 2:
        best_rank, bi = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, bi = r, i
        if bi < 0:
            break
        l, r = parts[bi], parts[bi + 1]
        merged, out, j = l + r, [], 0
        while j < len(parts):
            if j < len(parts) - 1 and parts[j] == l and parts[j + 1] == r:
                out.append(merged)
                j += 2
            else:
                out.append(parts[j])
                j += 1
        parts = out
    return parts


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the brown tree",
    "low lower lowest new newer newest",
    "a quick brown dog jumps over a lazy fox",
    "wider wide widest under over the tree",
    "the newest lower tree under the quick fox",
    "zebra quartz vex jackdaws my big sphinx",   # mostly OOV words
    "lowest widest newest quickest",             # partially mergeable
    "dog dog dog dog",                           # repeats
    "over under over under over",
    "x",                                         # single-char word
    "the",                                       # fully-merged word
    "supercalifragilistic lower the",            # long OOV + known
    "new new newer newest newest newest",
    "fox tree dog quick lazy brown",
    "a b c d e f g",                             # all single chars
]


def main():
    merges = train_merges(TRAIN_CORPUS, N_MERGES)
    ranks = {m: i for i, m in enumerate(merges)}
    pq.write_table(pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges]),
        "right": pa.array([m[1] for m in merges]),
    }), "fixtures/bpe_merges.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS),
    }), "fixtures/bpe_docs.parquet")
    toks = [[t for w in d.split() for t in encode_word(w, ranks)]
            for d in DOCS]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "n_tokens": pa.array([len(t) for t in toks], pa.int64()),
        "tokens_str": pa.array([" ".join(t) for t in toks]),
    }), "fixtures/bpe_expected.parquet")
    print(f"wrote {len(merges)} merges, {len(DOCS)} docs;"
          f" sample merges: {merges[:6]}")
    print(f" sample encoding 'lowest' -> {encode_word('lowest', ranks)}")


if __name__ == "__main__":
    main()

"""Real byte-pair-encoding tokenizer (round-3 VERDICT ask #4).

The reference has no tokenizer at all (its unit of work is the ontology
label, OntologyCUIProcessor.java walks annotations, not sub-words); this
is mandate-side: training-data token budgets and ``pack_sequences`` cut
points at 100 TB want a *real* BPE count, not the ``bpe_ish_token_count``
heuristic (functions/text.py). Design is the classic Sennrich-style
byte-level BPE:

  * pre-tokenize with the same word/punctuation split the heuristic
    uses (so the two counters see the same word stream);
  * each pre-token is a sequence of UTF-8 bytes; merges apply
    lowest-rank-first until none match — byte-level means NO unknown
    tokens, any input encodes;
  * the merges table is learned greedily (most frequent adjacent pair
    wins; ties break lexicographically, so training is deterministic).

Scale shape: training runs over a driver-side SAMPLE (the merges table
is a model artifact, trained at most once per corpus — at 100 TB you train on
a deterministic hash-sample and broadcast the result), while encoding
is the distributed hot path: the merges table rides to executors inside
a broadcast, batches arrive via Arrow (``mapInPandas``), and a per-word
LRU cache exploits the Zipfian word distribution so the merge loop runs
roughly once per DISTINCT word per batch, not once per occurrence.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mirrors the bpe_ish pre-tokenizer: words = runs of alnum, separated by
# anything else; punctuation runs count as pre-tokens too (they carry
# real token mass in web text)
_PRETOKEN_RX = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]+")


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RX.findall(text or "")


def _word_to_symbols(word: str) -> tuple[str, ...]:
    # byte-level alphabet: every symbol is a hex-rendered byte or a
    # concatenation of them; hex keeps symbols printable + unambiguous
    return tuple(f"{b:02x}" for b in word.encode("utf-8"))


def train_bpe(texts: list[str], n_merges: int = 256) -> list[tuple[str, str]]:
    """Greedy BPE training, pure Python, deterministic: repeatedly merge
    the most frequent adjacent symbol pair (ties → lexicographically
    smallest pair). Returns the ordered merges list — rank = position.

    Driver-side by design: the input is a sample, the output a model
    artifact measured in KB. O(n_merges × corpus_symbols) worst case.
    """
    # word frequency first: the merge count loop then runs over
    # DISTINCT words weighted by frequency (Zipf makes this ~10x
    # smaller than the raw stream)
    wordfreq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in pretokenize(t):
            sym = _word_to_symbols(w)
            if len(sym) >= 2:
                wordfreq[sym] = wordfreq.get(sym, 0) + 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, freq in wordfreq.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_wf: dict[tuple[str, ...], int] = {}
        for sym, freq in wordfreq.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            if len(out) >= 2:
                new_wf[tuple(out)] = new_wf.get(tuple(out), 0) + freq
        wordfreq = new_wf
        if not wordfreq:
            break
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE pre-token: repeatedly apply the lowest-rank merge
    present until none applies (the canonical BPE inference loop)."""
    sym = list(_word_to_symbols(word))
    while len(sym) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder (pure Python): token list for a whole text.
    The Spark operator's per-batch cache wraps the same per-word loop,
    so operator vs reference equality in tests is a real gate on the
    batching/caching machinery, and the committed count fixtures are a
    regression gate on the algorithm itself."""
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in pretokenize(text):
        out.extend(bpe_encode_word(w, ranks))
    return out


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """→ (id, n_bpe_tokens) — the distributed encoder, counting only.

    Arrow-batched ``mapInPandas`` (never row-at-a-time): the merges
    table is broadcast once per job, rebuilt into a rank dict once per
    PARTITION, and a per-executor ``lru_cache`` keyed on the word makes
    the merge loop amortize to once per distinct word. Map-only — no
    shuffle; the blob of text never moves, only (id, count) comes out.
    Produces the ``n_tokens_col`` input for ``sampling.pack_sequences``.
    """
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))
    src = docs.select(F.col(id_col), F.col(text_col))
    # carry the caller's actual id type through (url-string ids are as
    # legitimate as longs; a hardcoded `long` would null them in Arrow)
    id_ddl = src.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_ddl}, {out_col} int"

    def _count(it):
        import pandas as pd

        ranks = {p: i for i, p in enumerate(bc.value)}

        @lru_cache(maxsize=1 << 18)
        def word_len(w: str) -> int:
            return len(bpe_encode_word(w, ranks))

        for pdf in it:
            counts = [
                sum(word_len(w) for w in pretokenize(t)) if t is not None else 0
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: counts})

    return src.mapInPandas(_count, schema=schema)


def load_fixture_merges() -> list[tuple[str, str]]:
    """The committed merges table (trained on the sf0.01 documents
    corpus by ``scripts/gen_bpe_fixture.py``)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "bpe_merges.txt",
    )
    with open(path) as f:
        return [tuple(line.split()) for line in f if line.strip()]


def fixture_counts_path() -> str:
    """Absolute path of the committed per-doc reference counts CSV."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "bpe_counts_sf001.csv",
    )


def token_id_table(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic symbol → id mapping: ids 0-255 are the raw bytes
    (hex symbol of each byte), then one id per merge in rank order —
    the standard BPE vocab layout, reproducible from the merges table
    alone (no separate vocab artifact to ship)."""
    vocab = {f"{b:02x}": b for b in range(256)}
    for i, (a, b) in enumerate(merges):
        # two distinct merges can concatenate to the same byte string
        # (('61','6263') and ('6162','63') → '616263'); the FIRST rank
        # keeps its id so the mapping stays stable and every assigned
        # id reachable — a later overwrite would orphan the earlier id
        vocab.setdefault(a + b, 256 + i)
    return vocab


def bpe_token_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """→ (id, token_ids array<int>) — the full distributed encoder, the
    actual training-data product (``bpe_token_count`` is its counting
    twin; ``pack_sequences`` cuts sequences of exactly these ids).
    Same Arrow/mapInPandas/broadcast/LRU shape as the counter; the
    per-word cache stores the encoded id list."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))
    src = docs.select(F.col(id_col), F.col(text_col))
    id_ddl = src.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_ddl}, {out_col} array<int>"

    def _encode(it):
        import pandas as pd

        merges_l = bc.value
        ranks = {p: i for i, p in enumerate(merges_l)}
        vocab = token_id_table(merges_l)

        @lru_cache(maxsize=1 << 18)
        def word_ids(w: str) -> tuple[int, ...]:
            return tuple(vocab[s] for s in bpe_encode_word(w, ranks))

        for pdf in it:
            ids = [
                [i for w in pretokenize(t) for i in word_ids(w)]
                if t is not None
                else []
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: ids})

    return src.mapInPandas(_encode, schema=schema)

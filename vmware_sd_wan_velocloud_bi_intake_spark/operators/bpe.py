"""Distributed byte-pair-encoding (BPE) tokenizer training + encoding.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") adapted to the engine's scale discipline: after ONE
corpus-sized aggregation (the word-frequency count), every training
iteration operates on the DISTINCT-WORD table — vocabulary-sized, orders
of magnitude smaller than the corpus (the same shuffle story as
``operators/lm.py``). Per iteration exactly one row (the argmax pair)
reaches the driver; the merge pass itself is a JVM ``aggregate`` fold over
each word's symbol array — no Python in the loop.

Spec (deterministic, replicated verbatim by the pure-Python reference in
tests/test_bpe.py and the DuckDB first-iteration oracle):
- words = whitespace tokens of ``text.normalize_text`` output; each word's
  initial symbols are its characters plus a terminal ``</w>`` marker;
- pair counts are ALL adjacent symbol pairs (overlapping occurrences each
  count: "aaa" contributes (a,a) twice), weighted by word frequency;
- the winning pair maximizes (count DESC, left ASC, right ASC) — binary
  string order, identical to Python's for ASCII corpora;
- a merge pass replaces occurrences of the winner LEFT-TO-RIGHT,
  non-overlapping, in a single sweep (the merged token does not re-pair
  within the same pass);
- training stops after ``num_merges`` merges or when the best count drops
  below ``min_count``.

Scale: the corpus is touched once. Vocab-table lineage is truncated with
``localCheckpoint`` every ``checkpoint_every`` merges (the
``duplicate_components`` pattern) so the plan stays flat across hundreds
of merges without paying a vocab materialization job per merge; on a
cluster with executor churn swap in a reliable ``checkpoint`` dir at the
call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text

END = "</w>"

# Exact-trainer small-vocab arm (r13): distinct-word vocabularies at or
# under this row count are trained driver-side (see train_bpe). A vocab
# row is a word's symbol array + a count — ~100 bytes-scale — so the
# size-checked collect is bounded at a few MB; the distributed loop at
# this size is pure per-iteration scheduler floor (~0.25 s/argmax job on
# the bench box) for data that fits in one task.
SMALL_VOCAB_CAP = 65_536


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-sized shuffle."""
    words = docs.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    ).where(F.length("word") > 0)
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _init_symbols(word: Column) -> Column:
    # split BETWEEN characters only: "(?!^)(?=.)" matches neither the start
    # nor the end position (Spark's split keeps trailing empties, so a bare
    # "(?!^)" would append a spurious '' symbol to every word)
    return F.concat(F.split(word, r"(?!^)(?=.)"), F.array(F.lit(END)))


def _adjacent_pairs(sym: Column) -> Column:
    rest = F.slice(sym, 2, F.greatest(F.size(sym) - 1, F.lit(0)))
    z = F.zip_with(
        sym, rest, lambda a, b: F.struct(a.alias("left"), b.alias("right"))
    )
    return F.filter(z, lambda p: p["right"].isNotNull())


def merge_pass_expr(sym: Column, left: str, right: str) -> Column:
    """One left-to-right non-overlapping merge sweep as a JVM fold.

    Accumulator carries (out, pend): ``pend`` is the one symbol whose fate
    depends on its successor. A (pend=left, s=right) hit emits the merged
    token and clears ``pend`` — so the merged token cannot chain into a
    second merge within this pass, which is exactly the non-overlapping
    sweep the trainer's pair counts assume.
    """
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.concat(
                        acc["out"], F.array(F.lit(left + right))
                    ).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(sym, init, step, fin)


def merge_pass_multi_expr(sym: Column, pairs: list[tuple[str, str]]) -> Column:
    """One left-to-right sweep applying a SET of symbol-disjoint pairs.

    Same (out, pend) fold as :func:`merge_pass_expr`, but the hit test is a
    map lookup over all the round's pairs, so B merges cost ONE fold per
    word instead of B stacked folds. Correctness requires the pairs to be
    symbol-disjoint (no symbol appears in two pairs, and no pair's merged
    token is another pair's symbol — the batched trainer's selection rule):
    under that constraint, merging one pair can neither create nor destroy
    an adjacency of another, so the simultaneous sweep equals applying the
    pairs as sequential sweeps in any order (property-tested in
    tests/test_bpe.py). Lookup keys are LENGTH-PREFIXED
    (``len(left):leftright``), which is injective for ANY symbol bytes —
    a plain separator would be ambiguous the moment a symbol contains the
    separator character, and normalize_text only lowercases/collapses
    whitespace, so control bytes in web-corpus noise DO reach symbols
    (regression-tested with NUL-bearing symbols).
    """
    lookup = F.create_map(
        *[
            x
            for l, r in pairs
            for x in (F.lit(f"{len(l)}:{l}{r}"), F.lit(l + r))
        ]
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        merged = F.try_element_at(
            lookup,
            F.concat(
                F.length(acc["pend"]).cast("string"), F.lit(":"), acc["pend"], s
            ),
        )
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .when(
                merged.isNotNull(),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(sym, init, step, fin)


def select_disjoint_pairs(
    candidates: list[tuple[str, str, int]],
    batch: int,
    min_count_ratio: float = 0.0,
) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint selection from (left, right, cnt) candidates
    already ordered by the trainer's (cnt DESC, left ASC, right ASC).

    A candidate is taken iff neither of its symbols is occupied, where the
    occupied set holds every selected pair's left, right AND merged token
    (l+r): the first two make merges order-independent within the sweep;
    the third keeps a later candidate from pairing WITH a token this round
    creates (its observed count predates the merge). Driver-side over a
    bounded candidate list — pure, deterministic, unit-testable.

    ``min_count_ratio`` is the drift throttle: selection stops at the
    first candidate whose count falls below ``ratio × top count``. Counts
    far below the round's top are the ones whose TRUE post-merge rank is
    most likely to have been overtaken by pairs the round's merges create
    (chain merges like t+h → th+e). 0 batches everything (fastest, most
    drift); 1.0 batches exact ties only. NOTE drift is NOT guaranteed
    monotone in the ratio — divergent sequences compound path-dependently
    (the SCALE.md fixture table measured 0.9 at Jaccard 0.42 but 0.5 at
    0.51) — so measure per corpus rather than assuming tighter == closer.
    """
    taken: list[tuple[str, str, int]] = []
    occupied: set[str] = set()
    floor = candidates[0][2] * min_count_ratio if candidates else 0
    for l, r, c in candidates:
        if len(taken) >= batch:
            break
        if taken and c < floor:
            break
        if l in occupied or r in occupied or (l + r) in occupied:
            continue
        taken.append((l, r, c))
        occupied.update((l, r, l + r))
    return taken


def train_bpe_batched(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_count: int = 2,
    merge_batch: int = 16,
    checkpoint_every: int = 4,
    candidate_factor: int = 4,
    min_count_ratio: float = 0.5,
    loop_partitions: int | str | None = "auto",
) -> DataFrame:
    """BPE training with top-B merge ROUNDS — the scale path for real
    vocabularies. ``loop_partitions`` as in :func:`train_bpe` (the loop
    rule matters even more here: a 32k-vocab run is ~hundreds of rounds).

    :func:`train_bpe` is exact but job-serial in vocab size: one argmax
    Spark job per merge, so a production 32k-token vocabulary is ~32k
    sequential jobs — hours of pure scheduler floor (~0.3 s/job) at ANY
    data scale. This variant keeps ONE top-K collect per round and applies
    the ``merge_batch`` best NON-CONFLICTING pairs in a single
    :func:`merge_pass_multi_expr` sweep, cutting the job count (and the
    scheduler floor) ~B×.

    Selection per round: collect the top ``candidate_factor × merge_batch``
    pairs by the exact trainer's (count DESC, left, right) order, then
    greedily take up to B symbol-disjoint ones
    (:func:`select_disjoint_pairs`). Disjointness makes the simultaneous
    sweep equal to sequential sweeps, so **merge_batch=1 is EXACTLY
    train_bpe** (property-tested). For B>1 the trade-off is the standard
    batched-BPE drift: pairs after the round's first are applied with
    counts observed BEFORE the round's merges, so the merge SEQUENCE can
    diverge from exact BPE's where a round's merge would have changed a
    later winner — the resulting vocab overlap stays high (measured in
    tests/test_bpe.py and SCALE.md) because disjoint top pairs rarely
    interact. ``rank`` reflects application order and stays compatible
    with :func:`bpe_encode` / :func:`save_bpe`.

    Jobs per vocab: ceil(num_merges / B) argmax jobs + periodic
    checkpoints at ``min_count_ratio=0`` — the throttle's early stop can
    commit FEWER than B merges per round, so under the default 0.5 the
    job count is corpus-dependent between ceil(N/B) and N (the fixture
    measured 9.2× vs the unthrottled 15.4× at B=64, SCALE.md). Size
    hard job budgets at ratio 0, or measure on the target corpus.
    """
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    if merge_batch < 1:
        raise ValueError("merge_batch must be >= 1")
    from ..functions.conf import iterative_loop_confs

    spark = docs.sparkSession
    vocab = (
        word_vocab(docs, text_col)
        .select("freq", _init_symbols(F.col("word")).alias("sym"))
        .localCheckpoint(eager=True)
    )
    vocab, p = _loop_sized_vocab(vocab, loop_partitions)
    last_ckpt = vocab
    merges: list[tuple[int, str, str, int]] = []
    rounds_since_ckpt = 0
    with iterative_loop_confs(spark, p):
        while len(merges) < num_merges:
            want = min(merge_batch, num_merges - len(merges))
            top = (
                vocab.select(
                    "freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
                )
                .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
                .agg(F.sum("freq").alias("cnt"))
                .where(F.col("cnt") >= F.lit(min_count))
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(max(candidate_factor * want, want + 8))
                .collect()
            )
            if not top:
                break
            chosen = select_disjoint_pairs(
                [(r["left"], r["right"], int(r["cnt"])) for r in top],
                want,
                min_count_ratio=min_count_ratio,
            )
            if not chosen:
                break
            for l, r, c in chosen:
                merges.append((len(merges), l, r, c))
            vocab = vocab.withColumn(
                "sym",
                merge_pass_multi_expr(F.col("sym"), [(l, r) for l, r, _ in chosen]),
            )
            rounds_since_ckpt += 1
            # same end-of-training skip as train_bpe: no materialization job
            # for a vocab the loop is about to discard
            if rounds_since_ckpt >= checkpoint_every and len(merges) < num_merges:
                old = last_ckpt
                vocab = vocab.localCheckpoint(eager=True)
                last_ckpt = vocab
                old.unpersist()
                rounds_since_ckpt = 0
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def _loop_sized_vocab(vocab: DataFrame, loop_partitions):
    """Size the merge loop's parallelism to the VOCAB, not the corpus
    (functions/conf.py's loop rule): the vocab table the loop iterates
    over is orders of magnitude smaller than the corpus the session's
    shuffle partitioning was sized for, and every merge iteration pays
    the per-task scheduler floor across ALL of the checkpointed
    partitions. ``loop_partitions``: "auto" counts the (already
    checkpointed, so cheap) vocab once and shrinks to
    ``loop_partition_count``; an int is explicit; None keeps the
    upstream data partitioning (the scoped loop confs — AQE off,
    shuffle partitions pinned — still apply; pre-r10 the loop ran
    under plain session confs with AQE on). Shrinking
    re-checkpoints the coalesced vocab — one tiny vocab-sized job that
    the N-iteration loop amortizes immediately.
    """
    current = vocab.rdd.getNumPartitions()
    if loop_partitions is None:
        return vocab, current
    if loop_partitions == "auto":
        from ..functions.conf import loop_partition_count

        loop_partitions = loop_partition_count(vocab.count(), current)
    p = int(loop_partitions)
    if p < current:
        old = vocab
        vocab = vocab.coalesce(p).localCheckpoint(eager=True)
        old.unpersist()
    return vocab, p


def _train_bpe_driver(
    vocab: list[tuple[int, tuple[str, ...]]],
    num_merges: int,
    min_count: int,
) -> list[tuple[int, str, str, int]]:
    """Exact BPE merge loop over a collected (freq, symbols) vocab —
    the small-vocab arm of :func:`train_bpe`.

    Identical spec to the distributed loop (all-adjacent pair counts
    weighted by freq; winner = count DESC, left ASC, right ASC; one
    left-to-right non-overlapping sweep per merge) — equality with the
    distributed arm is pinned on seeded random corpora in
    tests/test_bpe.py. Tie-break parity holds because Python's str
    comparison (code points) and Spark's UTF8String comparison (UTF-8
    bytes) induce the same total order — UTF-8 is order-preserving.

    Argmax is a lazy max-heap keyed (-count, left, right): stale entries
    (count changed since push) are skipped on pop, so each merge costs
    O(affected words + log #pairs) instead of a full recount — the merge
    updates only words that contain the winning pair (tracked in a
    stale-tolerant pair → word-index map), applying the count delta of
    each rewritten word's before/after pair multisets.
    """
    import heapq
    from collections import Counter, defaultdict

    words: list[tuple[int, tuple[str, ...]]] = [
        (int(f), tuple(s)) for f, s in vocab
    ]
    pc: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> word idxs (stale-tolerant)
    for idx, (f, syms) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] += f
            where[p].add(idx)
    heap = [(-c, l, r) for (l, r), c in pc.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = None
        while heap:
            negc, l, r = heap[0]
            if pc.get((l, r), 0) == -negc:
                best = (l, r, -negc)
                break
            heapq.heappop(heap)  # stale: count changed since push
        if best is None or best[2] < min_count:
            break
        l, r, c = best
        merges.append((rank, l, r, c))
        touched: set = set()
        for idx in where.pop((l, r), ()):
            f, syms = words[idx]
            out: list[str] = []
            i, m = 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new = tuple(out)
            if new == syms:  # stale index entry: pair no longer adjacent
                continue
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] -= f
                touched.add((a, b))
            for a, b in zip(new, new[1:]):
                pc[(a, b)] += f
                touched.add((a, b))
                where[(a, b)].add(idx)
            words[idx] = (f, new)
        for p in touched:
            if pc[p] <= 0:
                del pc[p]
                continue
            heapq.heappush(heap, (-pc[p], p[0], p[1]))
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_count: int = 2,
    checkpoint_every: int = 4,
    loop_partitions: int | str | None = "auto",
    small_vocab_cap: int = SMALL_VOCAB_CAP,
) -> DataFrame:
    """Train a BPE merge table on the corpus.

    Returns (rank, left, right, pair_count) — ``rank`` is merge order. The
    driver holds only the merge table (``num_merges`` rows) and sees one
    argmax row per iteration; all counting and merging is distributed over
    the vocab table.

    ``checkpoint_every`` truncates the vocab lineage with an eager
    ``localCheckpoint`` every N merges instead of every merge (r7): the
    checkpoint is a full vocab materialization JOB, and between
    checkpoints the un-truncated plan just stacks ≤N cheap JVM merge
    folds onto the argmax scan — one job per iteration instead of two.
    At hundreds of merges the flat-plan guarantee is unchanged (the
    checkpoint still lands every N); pass 1 to restore the per-merge
    truncation.

    ``loop_partitions`` (default "auto") sizes the merge loop's
    parallelism to the measured vocab instead of the session default —
    see :func:`_loop_sized_vocab`. Merge selection is exact integer
    arithmetic with a total-order tie-break, so the result is
    partitioning-invariant (property-tested).

    **Adaptive small-vocab arm** (r13): the merge loop iterates over the
    DISTINCT-WORD table, which is orders of magnitude smaller than the
    corpus — and often small outright. Each distributed iteration is one
    argmax job whose cost on a small vocab is pure driver floor (Py4J +
    scheduling, ~0.25 s/job on the bench box — SCALE.md), so N merges
    pay N floors for data that fits in one task. When the checkpointed
    vocab holds ≤ ``small_vocab_cap`` rows (size-checked via a capped
    ``limit(cap+1)`` collect off the checkpoint — never an unbounded
    funnel, the ``duplicate_components`` small-graph discipline), the
    merge loop runs driver-side over the collected vocab instead
    (:func:`_train_bpe_driver` — same spec, same tie-break; cross-arm
    equality pinned on seeded random corpora in tests/test_bpe.py).
    Above the cap — or with ``small_vocab_cap=0``, which tests use to
    force it — the distributed loop runs unchanged. The corpus-sized
    word count and the encode pass stay distributed in both arms; at a
    32k-merge production vocabulary the scale path remains
    :func:`train_bpe_batched`.
    """
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    from ..functions.conf import iterative_loop_confs

    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).select(
        "freq", _init_symbols(F.col("word")).alias("sym")
    )
    if small_vocab_cap:
        # r14 (VERDICT r13 #8): probe + stage in ONE action. The probe
        # used to read a separately-materialized eager checkpoint — two
        # serial driver actions where the small-vocab arm (the common
        # local case) needs one: persist lazily, let the capped collect
        # BE the materializing job, and only build the loop checkpoint
        # when the vocab actually blows the cap (the distributed path
        # then reads mostly cached partitions; persist keeps lineage, so
        # no partial-checkpoint hazard).
        vocab = vocab.persist()
        head = vocab.limit(small_vocab_cap + 1).collect()
        if len(head) <= small_vocab_cap:
            merges = _train_bpe_driver(
                [(r["freq"], r["sym"]) for r in head], num_merges, min_count
            )
            vocab.unpersist()
            return spark.createDataFrame(
                merges, "rank long, left string, right string, pair_count long"
            )
    cached = vocab if small_vocab_cap else None
    vocab = vocab.localCheckpoint(eager=True)
    if cached is not None:
        cached.unpersist()
    vocab, p = _loop_sized_vocab(vocab, loop_partitions)
    last_ckpt = vocab
    merges: list[tuple[int, str, str, int]] = []
    with iterative_loop_confs(spark, p):
        for rank in range(num_merges):
            best = (
                vocab.select(
                    "freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
                )
                .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_count:
                break
            l, r, c = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
            merges.append((rank, l, r, c))
            vocab = vocab.withColumn("sym", merge_pass_expr(F.col("sym"), l, r))
            # skip the checkpoint when training is about to end: the vocab is
            # discarded after the loop, so a final-materialization job would
            # buy nothing (one full vocab write per run saved)
            if (rank + 1) % checkpoint_every == 0 and rank + 1 < num_merges:
                old = last_ckpt
                vocab = vocab.localCheckpoint(eager=True)
                last_ckpt = vocab
                old.unpersist()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def apply_merges_to_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table (canonical BPE encode:
    repeatedly apply the LOWEST-RANK pair present, each application a
    left-to-right non-overlapping sweep — the exact mirror of the
    training-side merge pass). Shared by the Arrow-batched encoder and the
    pure-Python test reference."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and ranks.get((syms[i], syms[i + 1])) == best_rank
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    memo_cap: int = 262_144,
) -> DataFrame:
    """Tokenize the corpus with a trained merge table.

    The merge table is tiny (``num_merges`` rows) — collected once and
    closed over into an Arrow-batched ``mapInPandas`` (per-row iterative
    merging is dense sequential logic, the documented Python carve-out;
    SCALE.md ground rule 1). Distinct words are memoized per task, so the
    per-task cost is O(distinct words), the same word-level caching real
    tokenizers use. Map-only: no shuffle.

    Memory contract: the memo holds at most ``memo_cap`` words and is
    CLEARED when full (encode is pure, so eviction only costs recompute) —
    a web-corpus partition full of unique-token noise (URLs, hex hashes)
    cannot push unbounded Python-side memory. Zipf reality: the hot words
    re-enter the memo immediately after a clear, so amortized hit rate is
    barely affected. The output is memo-invariant for ANY cap (tested at
    cap=2).

    Returns (doc_id, tokens array<string>, n_bpe_tokens).
    """
    if memo_cap < 1:
        raise ValueError("memo_cap must be >= 1")
    ranks = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.select("rank", "left", "right").collect()
    }

    def gen(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc_word(w):
            got = memo.get(w)
            if got is None:
                got = apply_merges_to_word(w, ranks)
                if len(memo) >= memo_cap:
                    memo.clear()
                memo[w] = got
            return got

        for pdf in batches:
            toks = []
            for t in pdf["_norm"]:
                row: list[str] = []
                for w in t.split(" "):
                    if w:
                        row.extend(enc_word(w))
                toks.append(row)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": toks,
                    "n_bpe_tokens": [len(t) for t in toks],
                }
            )

    staged = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.coalesce(normalize_text(F.col(text_col)), F.lit("")).alias("_norm"),
    )
    return staged.mapInPandas(
        gen, schema="doc_id long, tokens array<string>, n_bpe_tokens long"
    )


def save_bpe(merges: DataFrame, path: str) -> None:
    """Persist a trained merge table as a portable JSON artifact.

    The table is bounded by ``num_merges`` (driver-held already — the
    trainer built it from collected argmax rows), so this is a driver-side
    JSON dump through the shared crash-safe writer
    (functions/artifacts.py). The format is engine-neutral: any runtime
    that applies ranked merges can consume it.
    """
    from ..functions.artifacts import atomic_write_json

    rows = [
        {
            "rank": int(r["rank"]),
            "left": r["left"],
            "right": r["right"],
            "pair_count": int(r["pair_count"]),
        }
        for r in merges.orderBy("rank").collect()
    ]
    atomic_write_json(
        path, {"format": "bpe-merges/v1", "end_marker": END, "merges": rows}
    )


def load_bpe(spark, path: str) -> DataFrame:
    """Inverse of :func:`save_bpe` — returns the merge table with the
    exact trainer schema, ready for :func:`bpe_encode`."""
    from ..functions.artifacts import read_json_artifact

    payload = read_json_artifact(path, "bpe-merges/v1")
    if payload.get("end_marker") != END:
        raise ValueError(
            f"artifact end marker {payload.get('end_marker')!r} != {END!r}"
        )
    rows = [
        (int(r["rank"]), r["left"], r["right"], int(r["pair_count"]))
        for r in payload["merges"]
    ]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, pair_count long"
    )

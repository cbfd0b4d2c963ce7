"""Pure-python fuzz of the batched-BPE batch-selection rule against
sequential greedy (ADVICE r11 #1).

The batched trainer (`operators/corpus.py::_bpe_train_batched`) claims
bit-identical merges to sequential greedy BY CONSTRUCTION. The Spark
hypothesis property (`test_bpe_batched_trainer_equals_sequential`) can
only afford a handful of examples per run (each example is two full
Spark training loops), so THIS fuzz carries the statistical coverage of
the selection rule itself: it simulates both trainers in pure python —
same tokenization, same (count desc, l, r) ordering, same no-skip walk,
same self-composable-terminal rule, same strict-dominance truncation,
same single-pass left-to-right fold for the batch apply — over 20k
random corpora, and asserts equality on every one.

Against the UNFIXED rule (no self-composable termination) the same run
finds ~3 divergent corpora per 20k (seed 42: the three pinned in
`tests/test_properties.py::test_bpe_batched_fuzz_corpora_regression`),
all driven by a left==right pair admitted mid-batch whose application
creates a (l·l, l) pair bounded by the batch pair's OWN count.

Run: python tools/fuzz_bpe_batch_rule.py [n_corpora] [seed]
"""

from __future__ import annotations

import random
import re
import sys
from collections import Counter


def word_freqs(words: list[str]) -> Counter:
    wf: Counter = Counter()
    for doc in words:
        for w in re.split(r"\s+", doc.strip()):
            if w:
                wf[w] += 1
    return wf


def apply_pair(syms: list[str], l: str, r: str) -> list[str]:
    """Greedy left-to-right non-overlap apply of ONE pair — the python
    reference mirror of the sequential trainer's aggregate() fold."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def pair_counts(vocab: dict, wf: Counter) -> Counter:
    pc: Counter = Counter()
    for w, syms in vocab.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += wf[w]
    return pc


def sequential(words: list[str], n_merges: int):
    wf = word_freqs(words)
    vocab = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = pair_counts(vocab, wf)
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for w in vocab:
            vocab[w] = apply_pair(vocab[w], l, r)
    return merges


def batched_apply(syms: list[str], keys: set) -> list[str]:
    """Mirror of `_batched_merge_fold`: ONE left-to-right pass applying
    every batch pair (state = (emitted, carry); emitted merged symbols
    never re-enter the carry)."""
    out, carry = [], None
    for s in syms:
        if carry is None:
            carry = s
        elif (carry, s) in keys:
            out.append(carry + s)
            carry = None
        else:
            out.append(carry)
            carry = s
    if carry is not None:
        out.append(carry)
    return out


def batched(
    words: list[str],
    n_merges: int,
    batch_m: int,
    fix_selfcomposable: bool = True,
):
    """Mirror of `_bpe_train_batched`'s selection + apply. Pass
    fix_selfcomposable=False to reproduce the pre-r12 (broken) rule."""
    wf = word_freqs(words)
    vocab = {w: list(w) for w in wf}
    merges = []
    while len(merges) < n_merges:
        m = min(batch_m, n_merges - len(merges))
        pc = pair_counts(vocab, wf)
        if not pc:
            break
        rows = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: m + 1]
        rows = [(l, r, c) for (l, r), c in rows]
        touched: set = set()
        batch = []
        for left, right, cnt in rows[:m]:
            if left in touched or right in touched:
                break
            batch.append((left, right, cnt))
            touched.update((left, right, left + right))
            if fix_selfcomposable and left == right:
                break
        stop_cnt = rows[len(batch)][2] if len(batch) < len(rows) else None
        while len(batch) > 1 and stop_cnt is not None and batch[-1][2] == stop_cnt:
            batch.pop()
        for left, right, cnt in batch:
            merges.append((len(merges) + 1, left, right, cnt))
        keys = {(l, r) for l, r, _ in batch}
        for w in vocab:
            vocab[w] = batched_apply(vocab[w], keys)
    return merges


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = random.Random(seed)
    alpha = "abcxy "
    div_old = []
    for trial in range(n):
        nw = rng.randint(0, 12)
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
            for _ in range(nw)
        ]
        n_merges = rng.choice([3, 8, 24])
        batch_m = rng.choice([2, 4, 16])
        s = sequential(words, n_merges)
        if batched(words, n_merges, batch_m, fix_selfcomposable=False) != s:
            div_old.append((words, n_merges, batch_m))
        b = batched(words, n_merges, batch_m, fix_selfcomposable=True)
        assert b == s, (
            f"FIXED RULE DIVERGED: words={words!r} n_merges={n_merges} "
            f"batch_m={batch_m}\n  seq={s}\n  bat={b}"
        )
    # the ADVICE counterexample must also hold
    assert batched(["cc", "bbb"], 3, 2, fix_selfcomposable=False) != sequential(
        ["cc", "bbb"], 3
    )
    assert batched(["cc", "bbb"], 3, 2, fix_selfcomposable=True) == sequential(
        ["cc", "bbb"], 3
    )
    print(
        f"OK: {n} corpora (seed {seed}); fixed rule identical on all; "
        f"unfixed rule diverged on {len(div_old)}:"
    )
    for d in div_old:
        print(f"  {d}")


if __name__ == "__main__":
    main()

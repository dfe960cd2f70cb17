"""Vectorized per-line multi-pattern classification (SURVEY.md O5).

The reference tries each regex of the current FSM state per line
(exception_detector.rb:236-245).  Here classification is *context-free*: for
an Arrow batch of lines we evaluate the ≤40 distinct compiled patterns with
pandas ``Series.str.contains`` (unanchored search ≡ Ruby ``=~``), pack the
results into per-line match bitmasks, and intern the distinct masks.  Each
distinct mask then yields one column of the dense transition tables

* ``G[k, s]`` — state after a line of mask-class ``k`` arrives in state ``s``
  (including the reset-and-retry fallback of exception_detector.rb:206-212);
* ``B[k, s]`` — whether the *first* transition matched (``trace_seen_before``);
* ``absorbing[k]`` — ``G[k, :] == start_state`` everywhere: the line forces
  the FSM to start_state and empties the buffer *regardless of any prior
  history* (used as a synchronization point for salted chunk scans).

Tables are cached per (rules, mask) at executor scope — real log data has few
distinct masks, so per-batch table construction is amortized away.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..rules import N_STATES, START, CompiledRules

NIL_CLS = -1  # mask class of null/absent messages

_TABLE_CACHE: dict = {}


def match_matrix(texts: pd.Series, rules: CompiledRules) -> np.ndarray:
    """(n, n_patterns) bool match matrix; null texts match nothing."""
    n = len(texts)
    m = np.zeros((n, rules.n_patterns), dtype=bool)
    valid = texts.notna()
    if valid.any():
        sub = texts[valid.to_numpy()]
        for j, pat in enumerate(rules.patterns):
            m[valid.to_numpy(), j] = sub.str.contains(pat, regex=True).to_numpy(dtype=bool)
    return m


def _tables_for_mask(mask_key: bytes, mask: np.ndarray, rules: CompiledRules):
    cache_key = (id(rules), mask_key)
    hit = _TABLE_CACHE.get(cache_key)
    if hit is not None:
        return hit
    g = np.zeros(N_STATES, dtype=np.int8)
    b = np.zeros(N_STATES, dtype=bool)
    # first matching rule of start_state (for the retry path)
    retry_to = START
    for pid, to_state in rules.by_state[START]:
        if mask[pid]:
            retry_to = to_state
            break
    for s in range(N_STATES):
        to1 = -1
        for pid, to_state in rules.by_state[s]:
            if mask[pid]:
                to1 = to_state
                break
        if to1 >= 0:
            g[s], b[s] = to1, True
        else:
            g[s], b[s] = retry_to, False
    out = (g, b)
    _TABLE_CACHE[cache_key] = out
    return out


def classify_encoded(codes: np.ndarray, uniques: pd.Series, rules: CompiledRules):
    """Classify pre-interned lines: ``codes`` maps each row to its distinct
    line in ``uniques`` (-1 = null).  The regex bank runs once per distinct
    line only — callers that already hold a dictionary encoding (the Arrow
    scan stage) never materialize the non-distinct bulk as Python strings."""
    m = match_matrix(uniques, rules)
    if len(m) == 0:
        # all-null batch: keep one no-match class so downstream clip-indexing
        # of the tables stays valid (every row is NIL_CLS anyway)
        m = np.zeros((1, rules.n_patterns), dtype=bool)
        codes = np.full(len(codes), -1, dtype=np.int64)
    uniq, inverse = np.unique(m, axis=0, return_inverse=True)
    k = len(uniq)
    g_tab = np.zeros((k, N_STATES), dtype=np.int8)
    b_tab = np.zeros((k, N_STATES), dtype=bool)
    for ki in range(k):
        g, b = _tables_for_mask(uniq[ki].tobytes(), uniq[ki], rules)
        g_tab[ki] = g
        b_tab[ki] = b
    per_unique = inverse.astype(np.int32)
    cls = np.where(codes >= 0, per_unique[np.clip(codes, 0, None)], NIL_CLS).astype(np.int32)
    return cls, g_tab, b_tab, (g_tab == START).all(axis=1)


def classify(texts: pd.Series, rules: CompiledRules):
    """Classify a batch of lines.

    Returns ``(cls, G, B, absorbing)`` where ``cls`` is the per-line mask
    class (``NIL_CLS`` for nulls) and ``G``/``B``/``absorbing`` are indexed by
    class id.

    Lines are interned first (``pd.factorize``): log streams repeat lines
    heavily (identical stack frames, blank lines), so the ≤40-pattern regex
    bank runs once per *distinct* line, not once per row.
    """
    codes, uniques = pd.factorize(texts, use_na_sentinel=True)
    return classify_encoded(codes, pd.Series(uniques, dtype=object), rules)

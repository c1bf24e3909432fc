"""Data-quality expectations over table profiles — the ANALYZE loop as a
GATE, not just a planner input.

``operators.profile.profile_table`` already computes the per-column
statistics a pipeline collects once per table (row/null counts, HLL ndv,
min/max, string widths); this module evaluates declarative expectations
against those rows so a malformed upstream drop (nulled-out join key,
collapsed cardinality, out-of-range timestamps) fails the pipeline AT THE
GATE with a precise report instead of corrupting everything downstream.
The Great-Expectations idea reduced to the engine's discipline: the
statistics pass is the one scan profile_table already paid; evaluating
rules is O(columns) driver-side arithmetic.

A rule is a dict naming a column plus any of:

- ``min_rows`` / ``max_rows`` — table-level row-count bounds (checked on
  the column's profile row; identical on every row);
- ``max_null_frac`` — null fraction ceiling;
- ``min_ndv`` / ``max_ndv`` — approximate-distinct bounds (HLL ±~2.3%:
  pad bounds accordingly — these catch COLLAPSES, not off-by-ones);
- ``min_value`` / ``max_value`` — bounds compared against the profiled
  min/max (string-rendered; numeric rules are compared numerically);
- ``max_len`` — string width ceiling.

RELATIVE (drift) rules compare against the PREVIOUS release's profile
(``previous=`` — the snapshot manifest stores it, sinks/versioned.py), so
a release that clears every absolute floor but silently halves its row
count vs v(N−1) still fails the gate:

- ``min_row_ratio`` / ``max_row_ratio`` — bounds on n_rows / prev n_rows;
- ``max_null_frac_delta`` — ceiling on (null_frac − prev null_frac);
- ``min_ndv_ratio`` / ``max_ndv_ratio`` — bounds on ndv / prev ndv
  (HLL ±~2.3% on BOTH sides: pad bounds, these catch collapses);
- ``min_p50_ratio`` / ``max_p50_ratio`` (and the ``p90`` pair) — bounds
  on a histogram profile row's percentile estimate vs the previous
  release's (operators/incstats.py ``length_of`` rows; √2-bin resolution
  is ±~19% multiplicative, so set bounds outside that band — these catch
  a halved median document length, not single-bin wiggles).

Relative rules are skipped when there is no baseline — a first release,
a column new in this release, or a zero-valued previous denominator —
because "drift from nothing" is not a signal; the absolute rules are the
bootstrap gate.

``check_expectations`` returns violation dicts (empty = clean);
``enforce_expectations`` raises ``ExpectationError`` listing every
violation at once (a gate that reports one problem per run wastes runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ExpectationError(AssertionError):
    """Raised by :func:`enforce_expectations`; carries the violation list."""

    def __init__(self, violations: list[dict]):
        self.violations = violations
        lines = "; ".join(
            f"{v['column']}: {v['rule']} (expected {v['expected']}, "
            f"got {v['actual']})"
            for v in violations
        )
        super().__init__(f"{len(violations)} expectation(s) failed: {lines}")


def _num(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _profile_rows(profile) -> dict[str, dict]:
    if hasattr(profile, "collect"):
        profile = profile.collect()
    return {
        r["column"]: (r.asDict() if hasattr(r, "asDict") else dict(r))
        for r in profile
    }


def check_expectations(
    profile: "DataFrame | list[dict]",
    rules: list[dict],
    previous: "DataFrame | list[dict] | None" = None,
) -> list[dict]:
    """Evaluate ``rules`` against ``profile_table`` output; return the
    violations (column, rule, expected, actual), empty when clean.
    ``previous`` is the prior release's profile (same shape) — required
    only for the relative rules, which are skipped without a baseline."""
    rows = _profile_rows(profile)
    prev_rows = _profile_rows(previous) if previous is not None else {}
    out: list[dict] = []

    def viol(col, rule, expected, actual):
        out.append(
            {"column": col, "rule": rule, "expected": expected, "actual": actual}
        )

    for rule in rules:
        col = rule.get("column")
        if col not in rows:
            viol(col, "column_exists", "profiled column", "missing")
            continue
        p = rows[col]
        n_rows = int(p["n_rows"])
        if "min_rows" in rule and n_rows < rule["min_rows"]:
            viol(col, "min_rows", rule["min_rows"], n_rows)
        if "max_rows" in rule and n_rows > rule["max_rows"]:
            viol(col, "max_rows", rule["max_rows"], n_rows)
        if "max_null_frac" in rule and p["null_frac"] > rule["max_null_frac"]:
            viol(col, "max_null_frac", rule["max_null_frac"], p["null_frac"])
        ndv = p.get("ndv_approx")
        if "min_ndv" in rule and (ndv is None or ndv < rule["min_ndv"]):
            viol(col, "min_ndv", rule["min_ndv"], ndv)
        if "max_ndv" in rule and ndv is not None and ndv > rule["max_ndv"]:
            viol(col, "max_ndv", rule["max_ndv"], ndv)
        if "min_value" in rule:
            lo, got = rule["min_value"], p.get("min_str")
            gn = _num(got)
            ok = (
                got is not None
                and (gn >= float(lo) if _num(lo) is not None and gn is not None
                     else str(got) >= str(lo))
            )
            if not ok:
                viol(col, "min_value", lo, got)
        if "max_value" in rule:
            hi, got = rule["max_value"], p.get("max_str")
            gn = _num(got)
            ok = (
                got is not None
                and (gn <= float(hi) if _num(hi) is not None and gn is not None
                     else str(got) <= str(hi))
            )
            if not ok:
                viol(col, "max_value", hi, got)
        if "max_len" in rule:
            ml = p.get("max_len")
            if ml is not None and ml > rule["max_len"]:
                viol(col, "max_len", rule["max_len"], ml)
        # ---- relative (drift) rules — need the previous profile --------
        pv = prev_rows.get(col)
        if pv is None:
            continue
        prev_n = int(pv["n_rows"])
        if prev_n > 0:
            ratio = n_rows / prev_n
            if "min_row_ratio" in rule and ratio < rule["min_row_ratio"]:
                viol(col, "min_row_ratio", rule["min_row_ratio"], round(ratio, 6))
            if "max_row_ratio" in rule and ratio > rule["max_row_ratio"]:
                viol(col, "max_row_ratio", rule["max_row_ratio"], round(ratio, 6))
        if "max_null_frac_delta" in rule:
            delta = float(p["null_frac"]) - float(pv["null_frac"])
            if delta > rule["max_null_frac_delta"]:
                viol(
                    col,
                    "max_null_frac_delta",
                    rule["max_null_frac_delta"],
                    round(delta, 6),
                )
        prev_ndv = pv.get("ndv_approx")
        ndv_now = p.get("ndv_approx")
        if prev_ndv and ndv_now is not None:
            nratio = ndv_now / prev_ndv
            if "min_ndv_ratio" in rule and nratio < rule["min_ndv_ratio"]:
                viol(col, "min_ndv_ratio", rule["min_ndv_ratio"], round(nratio, 6))
            if "max_ndv_ratio" in rule and nratio > rule["max_ndv_ratio"]:
                viol(col, "max_ndv_ratio", rule["max_ndv_ratio"], round(nratio, 6))
        # distributional drift over histogram rows (incstats length_of
        # profiles carry p50_est/p90_est; the √2-bin resolution is ±~19%
        # multiplicative — set ratio bounds outside that band)
        for stat in ("p50", "p90"):
            prev_q, now_q = pv.get(f"{stat}_est"), p.get(f"{stat}_est")
            lo_key, hi_key = f"min_{stat}_ratio", f"max_{stat}_ratio"
            if prev_q is None:
                continue  # no baseline estimate: relative rules are inert
            if now_q is None:
                # the baseline HAD a distribution and the current profile
                # has none (all-NULL column / empty histogram) — the most
                # degenerate drift of all; a configured rule must fire,
                # not silently skip (the min_ndv loud-not-silent contract)
                for key in (lo_key, hi_key):
                    if key in rule:
                        viol(col, key, rule[key], None)
                continue
            if prev_q == 0:
                # a zero baseline percentile is a real (degenerate) state
                # — majority-empty strings — not "no baseline": staying at
                # 0 is ratio 1 (no drift), leaving 0 is infinite upward
                # drift, so a configured max ratio must fire loudly
                qratio = 1.0 if now_q == 0 else float("inf")
            else:
                qratio = now_q / prev_q
            if lo_key in rule and qratio < rule[lo_key]:
                viol(col, lo_key, rule[lo_key], round(qratio, 6))
            if hi_key in rule and qratio > rule[hi_key]:
                viol(col, hi_key, rule[hi_key], round(qratio, 6))
    return out


def enforce_expectations(
    profile: "DataFrame | list[dict]",
    rules: list[dict],
    previous: "DataFrame | list[dict] | None" = None,
) -> None:
    """Gate form: raise :class:`ExpectationError` listing EVERY violation
    (one report per run, not one problem per run); no-op when clean."""
    violations = check_expectations(profile, rules, previous=previous)
    if violations:
        raise ExpectationError(violations)

#!/usr/bin/env python3
"""Oracle-dialect risk audit (dev tooling, driver-independent).

The ev_rfm class of red row (VERDICT r11 #1, r12 #3): the driver's DuckDB
evaluates a dialect-EDGE form differently after a version bump, the oracle
silently changes value, and a green gate goes red with no repo change.
Those bugs were fixed one query at a time; this tool prevents the next one
wholesale by grepping every shipped oracle for the risky forms the r11/r12
fixes eliminated:

  R1 neg-intdiv   `//` whose dividend can be negative (floor-vs-truncate
                  flipped across engines/versions; on nonnegative operands
                  every convention agrees)
  R2 comma-join   implicit comma joins in a FROM that ALSO has an explicit
                  JOIN chain (precedence edge: MySQL 5.0 famously rebound
                  it), or whose comma RHS is a non-LATERAL subquery. Pure
                  `ident, ident` CTE pairs and unnest/range laterals are
                  the documented bounded-cross-join class — well-defined
                  lowest-precedence in every engine, not flagged.
  R3 cast-bool    CAST of a bare comparison to a numeric type (bool->int
                  rules are engine-variant); `->`/`->>` JSON arrows are
                  excluded first
  R4 bare-sum     SUM(...) used as an OUTPUT VALUE of the final SELECT
                  without a CAST wrapper (DuckDB widens SUM(BIGINT) to
                  HUGEINT and SUM(DECIMAL(p,s)) to DECIMAL(38,s); Spark
                  widens differently — an uncast sum ships an
                  engine-variant width). Sums inside comparisons (CASE
                  guards) don't ship and aren't flagged.
  R5 quantile     any quantile*/percentile* call (interpolation conventions
                  are the classic cross-engine trap)

Findings that are SAFE get an entry in ANNOTATIONS below stating why —
the audit's contract is the same as the judge's: zero violations OR every
violation annotated. Exit 0 iff every finding is annotated.

Usage:  python3 tools/oracleaudit.py <verifyOutDir>
  where <verifyOutDir>/oracle_sql.json was produced by graft.Verify.
Run it next to typeaudit.py after every battery dump.
"""
import json
import re
import sys
from pathlib import Path

# (query, rule) -> why the finding is safe. Every entry was verified by
# reading the oracle AND the op source; a new finding without an entry is
# a violation until audited.
ANNOTATIONS = {
    # R1: dividends proven nonnegative ------------------------------------
    ("aud_combined", "neg-intdiv"):
        "dividend ((n-1)*p): n = COUNT(*) of a non-empty partition >= 1, "
        "p is the nonneg percentile grid index",
    ("aud_robust_outliers", "neg-intdiv"):
        "same ((n-1)*p) interpolation idiom: n >= 1, p >= 0",
    ("aud_winsorize", "neg-intdiv"):
        "same ((n-1)*p) interpolation idiom: n >= 1, p >= 0",
    ("q34_quantile_refine", "neg-intdiv"):
        "same ((n-1)*p) interpolation idiom: n >= 1, p >= 0",
    ("aud_srm", "neg-intdiv"):
        "dividend is a SQUARED residual times 1e9 — provably >= 0",
    ("dd_triangles", "neg-intdiv"):
        "dividend d*(d-1): vertex degree d >= 0, so the product >= 0",
    ("ev_rfm", "neg-intdiv"):
        "dividend gmx - mx: corpus-global max ts >= per-user max ts by "
        "construction (the r11 double-emission rewrite pinned this)",
    ("tx_chunk_text", "neg-intdiv"):
        "dividend (n - 16 + 11) only reached in the ELSE of n <= 16, "
        "so it is >= 6",
    ("tx_length_buckets", "neg-intdiv"):
        "dividend ROW_NUMBER() - 1 >= 0",
    ("tx_pack", "neg-intdiv"):
        "ceiling-division idiom (cb + tok - 1)//tok with cumulative "
        "token count cb >= 0 and per-doc tok >= 1",
    ("aud_holt", "neg-intdiv"):
        "the Holt trend dividend goes negative BY DESIGN on cooling "
        "series; the op deliberately uses truncating Java long division "
        "to match DuckDB // exactly (doc-pinned in both op and oracle, "
        "AuditOpsSpec-covered; the one audited-and-accepted negative "
        "intdiv in the battery)",
    ("ev_lorenz", "neg-intdiv"):
        "dividend (rk - 1) * 10: rk = ROW_NUMBER() >= 1",
    # R2: comma joins verified unambiguous --------------------------------
    ("aud_benford", "comma-join"):
        "`e LEFT JOIN g ON g.digit = e.digit, t`: the ON references only "
        "the explicit chain, t is the 1-row total — any precedence "
        "rebinding yields the same rows",
    ("tx_pmi", "comma-join"):
        "JOIN..USING chain then `, t` 1-row total; USING names resolve "
        "inside the chain only",
    ("aud_combined", "comma-join"):
        "comma RHS is the percentile-grid VALUES subquery (bounded, "
        "deliberate cross product with the 1-row stats CTE)",
    ("aud_robust_outliers", "comma-join"):
        "comma RHS is the percentile-grid subquery — same bounded class",
    ("ev_gap_fill", "comma-join"):
        "comma RHS is the day-spine unnest(range(..)) subquery — the "
        "deliberate bounded spine cross join",
    # R4: uncast final-select sums verified width-stable -------------------
    ("sim_trace_stats", "bare-sum"):
        "SUM over the exact BIGINT LCG chain feeds a single division "
        "whose DOUBLE result is the output (never the sum itself); "
        "r12-pinned by the Arrow-strict verifier",
    # R5: quantile calls with pinned conventions ---------------------------
    ("q22_percentiles", "quantile"):
        "documented weak-by-rule builtin anchor (PLANS.md) — "
        "quantile_cont mirrors Spark percentile's linear interpolation; "
        "scale twin is q34_quantile_refine which interpolates by hand",
    ("sim_gbm_stats", "quantile"):
        "quantile_cont(qfin, 0.05) over DECIMAL-quantized finals mirrors "
        "the op's exact interpolated percentile (shared r12 convention)",
    ("sim_ou_final", "quantile"):
        "same shared interpolated-percentile convention as sim_gbm_stats "
        "(quantile_cont over decimal-quantized exact values)",
    ("ev_time_to_convert", "quantile"):
        "r12 shared interpolated percentiles over exact integer gaps — "
        "the op computes the identical (n-1)*p interpolation",
}

CLAUSE = re.compile(
    r'\b(WHERE|GROUP|ORDER|WINDOW|HAVING|LIMIT|UNION|SELECT|QUALIFY)\b', re.I)


def strip_strings(s):
    return re.sub(r"'[^']*'", "''", s)


def match_paren_back(s, close_idx):
    """Index of the '(' matching the ')' at close_idx."""
    depth = 0
    for i in range(close_idx, -1, -1):
        if s[i] == ')':
            depth += 1
        elif s[i] == '(':
            depth -= 1
            if depth == 0:
                return i
    return -1


def match_paren_fwd(s, open_idx):
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == '(':
            depth += 1
        elif s[i] == ')':
            depth -= 1
            if depth == 0:
                return i
    return len(s) - 1


def has_binary_minus(expr):
    """Binary minus at ANY depth of expr (a subtraction anywhere in the
    dividend can drive it negative — `(a - b) * p` is the idiom the rule
    exists for); unary minus after an operator/open-paren not counted."""
    for i, c in enumerate(expr):
        if c == '-':
            j = i - 1
            while j >= 0 and expr[j].isspace():
                j -= 1
            if j >= 0 and (expr[j].isalnum() or expr[j] in ')_'):
                return True
    return False


def intdiv_findings(name, sql):
    out = []
    for m in re.finditer(r'//', sql):
        i = m.start() - 1
        while i >= 0 and sql[i].isspace():
            i -= 1
        if i < 0:
            continue
        if sql[i] == ')':
            o = match_paren_back(sql, i)
            operand = sql[o + 1:i]
        else:
            j = i
            while j >= 0 and (sql[j].isalnum() or sql[j] in '._$'):
                j -= 1
            operand = sql[j + 1:i + 1]
        if has_binary_minus(operand):
            out.append(("neg-intdiv",
                        operand.replace('\n', ' ').strip()[:70]))
    return out


def from_segments(sql):
    """Depth-0 FROM clause texts with nested parens masked."""
    segs = []
    for m in re.finditer(r'\bFROM\b', sql, re.I):
        i, depth, seg = m.end(), 0, ''
        while i < len(sql):
            c = sql[i]
            if c == '(':
                if depth == 0:
                    # keep the masked subquery marker
                    end = match_paren_fwd(sql, i)
                    lateral = bool(re.search(r'LATERAL\s*$', seg, re.I))
                    seg += '(LATERAL)' if lateral else '(SUB)'
                    i = end + 1
                    continue
            elif c == ')':
                if depth == 0:
                    break
            elif depth == 0 and CLAUSE.match(sql, i):
                break
            seg += c
            i += 1
        segs.append(seg)
    return segs


def comma_findings(name, sql):
    out = []
    for seg in from_segments(sql):
        commas = [c.start() for c in re.finditer(r',', seg)]
        if not commas:
            continue
        mixed = bool(re.search(r'\bJOIN\b', seg, re.I))
        for ci in commas:
            rhs = seg[ci + 1:].lstrip()
            if re.match(r'(unnest|generate_series|range)\s*\(', rhs, re.I):
                continue
            if rhs.startswith('(LATERAL)'):
                continue
            if rhs.startswith('(SUB)'):
                out.append(("comma-join",
                            ("subquery RHS: " + seg.replace('\n', ' '))[:70]))
                continue
            if mixed:
                out.append(("comma-join",
                            ("mixed with JOIN: " + seg.replace('\n', ' '))[:70]))
    # one finding per query per flavor is enough
    seen, uniq = set(), []
    for r, d in out:
        key = (r, d.split(':')[0])
        if key not in seen:
            seen.add(key)
            uniq.append((r, d))
    return uniq


def castbool_findings(name, sql):
    out = []
    s = sql.replace('->>', '@@').replace('->', '@')
    for m in re.finditer(r'\bCAST\s*\(', s, re.I):
        o = s.index('(', m.start())
        c = match_paren_fwd(s, o)
        arg = s[o + 1:c]
        # argument before the trailing AS <type>
        arg_expr = re.sub(r'\bAS\s+\w+(\(\s*\d+(\s*,\s*\d+)?\s*\))?\s*$',
                          '', arg, flags=re.I)
        if re.match(r'\s*CASE\b', arg_expr, re.I):
            continue
        depth = 0
        for i, ch in enumerate(arg_expr):
            if ch == '(':
                depth += 1
            elif ch == ')':
                depth -= 1
            elif depth == 0 and ch in '<>=' and not (
                    ch == '=' and i > 0 and arg_expr[i-1] in '<>!'):
                out.append(("cast-bool",
                            arg.replace('\n', ' ').strip()[:70]))
                break
    return out


def cast_spans(s):
    spans = []
    for m in re.finditer(r'\b(CAST|ROUND|COALESCE)\s*\(', s, re.I):
        o = s.index('(', m.start())
        spans.append((o, match_paren_fwd(s, o)))
    return spans


def final_select_lists(s):
    """The select list of EVERY depth-0 SELECT (oracles like aud_card are
    depth-0 UNION ALL chains — each member SHIPS rows, so each member's
    outputs must be audited, not just the last one's)."""
    starts = []
    depth = 0
    for i, c in enumerate(s):
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif depth == 0 and s[i:i + 6].upper() == 'SELECT':
            starts.append(i)
    out = []
    for st in starts:
        endm, depth = None, 0
        for i in range(st, len(s)):
            c = s[i]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            elif depth == 0 and s[i:i + 4].upper() == 'FROM':
                endm = i
                break
        out.append(s[st:endm] if endm else s[st:])
    return out


def baresum_in(sel):
    spans = cast_spans(sel)
    out = []
    for m in re.finditer(r'\bSUM\s*\(', sel, re.I):
        if any(a < m.start() < b for a, b in spans):
            continue
        close = match_paren_fwd(sel, sel.index('(', m.start()))
        # a sum feeding a comparison (CASE guard) never ships as output:
        # scan forward within the expression (to a depth-0 AS/THEN/END/
        # comma boundary) for a comparison operator — this also covers
        # `SUM(a) - SUM(b) > 0` arithmetic guards
        guard, depth, i = False, 0, close + 1
        while i < len(sel):
            c = sel[i]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            elif depth == 0:
                if c == ',':
                    break
                if re.match(r'\b(AS|THEN|END|WHEN|FROM)\b', sel[i:], re.I):
                    break
                if c in '<>=':
                    guard = True
                    break
            i += 1
        if guard:
            continue
        out.append(("bare-sum", sel[m.start():close + 1]
                    .replace('\n', ' ')[:70]))
    return out


def baresum_findings(name, sql):
    s = strip_strings(sql)
    out = []
    for sel in final_select_lists(s):
        out.extend(baresum_in(sel))
    return out


def quantile_findings(name, sql):
    out = []
    for m in re.finditer(r'\b(quantile(_cont|_disc)?|percentile(_cont|_disc)?)'
                         r'\s*\(', sql, re.I):
        out.append(("quantile", sql[m.start():m.start() + 50]
                    .replace('\n', ' ')))
    # one per query
    return out[:1]


def main(out_dir):
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_find, n_viol = 0, 0
    for name in sorted(oracle):
        # strings stripped first; JSON arrows masked so `->>` never reads
        # as a binary minus / comparison
        sql = strip_strings(oracle[name]).replace('->>', '@@@').replace('->', '@@')
        finds = (intdiv_findings(name, sql) + comma_findings(name, sql)
                 + castbool_findings(name, sql) + baresum_findings(name, sql)
                 + quantile_findings(name, sql))
        seen = set()
        for rule, detail in finds:
            if (name, rule) in seen:
                continue
            seen.add((name, rule))
            n_find += 1
            note = ANNOTATIONS.get((name, rule))
            if note:
                print(f"OK        {name} [{rule}] {detail}")
            else:
                n_viol += 1
                print(f"VIOLATION {name} [{rule}] {detail}")
    print(f"== {len(oracle)} oracles, {n_find} findings, "
          f"{n_find - n_viol} annotated, {n_viol} violations ==")
    return 1 if n_viol else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

"""Engine-stability lint for DuckDB oracle SQL strings.

The r02 driver ran the ``sequence_packing`` oracle under a DuckDB
build the repo doesn't control and got a value-hash divergence the
local run couldn't reproduce — traced to constructs whose semantics
or result TYPES shift across engine versions.  This lint rejects
those constructs up front so every oracle stays portable:

* **Reserved-word output columns** (``AS "offset"`` …) — quoting
  behavior and result-column naming differ across engines/fetch
  layers.
* **FLOOR without an explicit CAST wrapper** — ``FLOOR`` returns
  DOUBLE in some engines, DECIMAL/BIGINT in others; an un-CAST FLOOR
  changes the fetched cell type.
* **Un-CAST window/running SUM** — DuckDB sums BIGINT into HUGEINT,
  which pyarrow fetches as decimal128; an explicit
  ``CAST(SUM(...) OVER (...) AS BIGINT)`` pins the type.
* **Bare ``/`` feeding FLOOR** — integer ``/`` is integer division in
  some engines and float division in DuckDB; inside a FLOOR the two
  disagree exactly at the values that matter.  Use ``//`` (floor
  div) or divide explicitly-CAST doubles.
"""

from __future__ import annotations

import re

# output-column names that are reserved (or fetch-layer-special) in at
# least one of: DuckDB, Spark SQL, PostgreSQL, SQLite
RESERVED_OUTPUT_NAMES = frozenset(
    """
    offset order group select from where limit rows row range window
    partition table values user default primary desc asc cast left
    right join on using natural cross union except intersect case when
    then else end all any some exists in is null not and or between
    """.split()
)


def lint_oracle_sql(sql: str) -> list[str]:
    """Return a list of engine-portability problems (empty = clean)."""
    problems: list[str] = []
    # 1. reserved output aliases, quoted or bare.  No exemptions: a
    # token after AS is an alias position in every engine this lint
    # targets (the AS inside CAST(x AS TYPE) is followed by a TYPE
    # name, and type names like BIGINT are not in the reserved list).
    for m in re.finditer(r'(?i)\bAS\s+("?)([A-Za-z_][A-Za-z0-9_]*)\1', sql):
        name = m.group(2).lower()
        if name in RESERVED_OUTPUT_NAMES:
            problems.append(f"reserved-word output alias {m.group(2)!r}")
    # 2. FLOOR not pinned by a cast — result type varies by engine.
    # Accepted forms: `CAST(FLOOR(...) AS T)` or postfix `FLOOR(...)::T`
    for m in re.finditer(r"(?i)\bFLOOR\s*\(", sql):
        pre = sql[max(0, m.start() - 8) : m.start()].upper()
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if "CAST" not in pre and not sql[i:].lstrip().startswith("::"):
            problems.append("FLOOR(...) without explicit cast")
    # 3. window SUM whose RESULT is not directly pinned by a cast —
    # HUGEINT/decimal type drift.  The SUM argument is paren-matched
    # (a CAST inside the argument does not pin the SUM result), OVER
    # and its (...) window spec are skipped, and the pin must be either
    # a directly-wrapping CAST( ... immediately before SUM, or a
    # postfix ::TYPE after the window spec.
    for m in re.finditer(r"(?i)\bSUM\s*\(", sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        rest = sql[i:]
        mo = re.match(r"(?is)\s*OVER\s*\(", rest)
        if not mo:
            continue  # plain aggregate; fetch layers widen consistently
        depth, j = 1, i + mo.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        directly_wrapped = re.search(
            r"(?i)CAST\s*\(\s*(COALESCE\s*\(\s*)?$", sql[: m.start()]
        )
        postfix_cast = sql[j:].lstrip(" \t\n)").startswith("::")
        if not directly_wrapped and not postfix_cast:
            problems.append("window SUM(...) OVER without pinning CAST")
    # 4. bare `/` inside a FLOOR argument
    for m in re.finditer(r"(?i)\bFLOOR\s*\(", sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        arg = sql[m.end() : i - 1]
        # strip floor-div `//` tokens FIRST: an argument mixing `//`
        # with a separate bare `/` must still be flagged (r3 advisory)
        if "/" in arg.replace("//", "") and "DOUBLE" not in arg.upper():
            problems.append("bare `/` division inside FLOOR argument")
    return problems


def lint_all(oracles: dict[str, str]) -> dict[str, list[str]]:
    """Lint every oracle; returns only the queries with problems."""
    out = {}
    for name, sql in oracles.items():
        p = lint_oracle_sql(sql)
        if p:
            out[name] = p
    return out

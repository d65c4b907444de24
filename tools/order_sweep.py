#!/usr/bin/env python3
"""Mechanical tie-totality sweep over every oracle's final ORDER BY.

The driver compare (tools/check.py is its local stand-in) is POSITIONAL:
after sorting columns by name it compares cell values row-by-row. So a
query whose final ordering key admits ties between NON-identical rows is
a latent cross-engine failure — both engines satisfy the ORDER BY, each
in its own tie order (this class bit four times: q353/q354 in r11,
q251/q263 at the r12 x10 carve). This tool closes the CLASS: for each
oracle in <verifyOutDir>/oracle_sql.json it verifies, at whatever SF
<sfDir> points to (run it at the x10 carve), that

  every tie group of the final ORDER BY key contains at most ONE
  distinct full row

i.e. the ordering is total over distinct rows. Queries with a trailing
LIMIT are checked on the PRE-limit relation (ties at the limit boundary
select different rows per engine). Queries with no top-level ORDER BY
pass only if the result has <= 1 row.

Usage: python3 tools/order_sweep.py <sfDir> <verifyOutDir> [i/N]

Output: one line per query —
  TOTAL <name>            ordering key total over distinct rows
  SINGLE <name>           no ORDER BY but <= 1 row
  VIOLATION <name> <n>    n tie groups with > 1 distinct row
  MANUAL <name> <why>     needs eyes (unparseable / key not evaluable)
Exit 1 if any VIOLATION or MANUAL.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def depth0_spans(sql, kw):
    """Start offsets of keyword `kw` at paren depth 0, outside quotes."""
    up = sql.upper()
    d = 0
    i = 0
    out = []
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literal ('' escapes)
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == '"':  # skip quoted identifier
            i += 1
            while i < n and sql[i] != '"':
                i += 1
        elif c == '(':
            d += 1
        elif c == ')':
            d -= 1
        elif d == 0 and up.startswith(kw, i) \
                and (i == 0 or not (up[i - 1].isalnum() or up[i - 1] == '_')) \
                and (i + len(kw) >= n or not (up[i + len(kw)].isalnum()
                                              or up[i + len(kw)] == '_')):
            out.append(i)
        i += 1
    return out


def split_depth0_commas(text):
    parts = []
    d = 0
    cur = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "'":
            cur.append(c)
            i += 1
            while i < n:
                cur.append(text[i])
                if text[i] == "'" and not (i + 1 < n and text[i + 1] == "'"):
                    break
                i += 1
        elif c == '(':
            d += 1
            cur.append(c)
        elif c == ')':
            d -= 1
            cur.append(c)
        elif c == ',' and d == 0:
            parts.append(''.join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append(''.join(cur).strip())
    return [p for p in parts if p]


SUFFIX = re.compile(
    r'(\s+(ASC|DESC))?(\s+NULLS\s+(FIRST|LAST))?\s*$', re.IGNORECASE)


def order_key_terms(sql):
    """(body_without_trailing_limit, [key terms]) for the LAST depth-0
    ORDER BY, or (sql, None) when the query has none."""
    obs = depth0_spans(sql, 'ORDER BY')
    if not obs:
        return sql, None
    ob = obs[-1]
    tail = sql[ob + len('ORDER BY'):]
    lims = depth0_spans(tail, 'LIMIT')
    if lims:
        terms_text = tail[:lims[0]]
        body = sql[:ob + len('ORDER BY')] + tail[:lims[0]]
    else:
        terms_text = tail
        body = sql
    terms = [SUFFIX.sub('', t).strip() for t in split_depth0_commas(terms_text)]
    return body, [t for t in terms if t]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    shard_i, shard_n = 0, 1
    if len(sys.argv) > 3:
        shard_i, shard_n = (int(x) for x in sys.argv[3].split('/'))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items())[shard_i::shard_n]:
        try:
            body, terms = order_key_terms(sql)
            if terms is None:
                n = con.execute(
                    f"SELECT count(*) FROM (SELECT DISTINCT * "
                    f"FROM ({sql}))").fetchone()[0]
                if n <= 1:
                    print(f"SINGLE {name}")
                else:
                    print(f"VIOLATION {name} no-order-by rows={n}")
                    bad += 1
                continue
            # resolve positional terms (ORDER BY 1) to output column names
            cols = [d[0] for d in con.execute(
                f"SELECT * FROM ({body}) LIMIT 0").description]
            colset = set(cols)

            def strip_qualifier(m):
                # `r.name` binds in the original FROM scope but not in
                # the wrapped result; the projected column is the bare
                # name whenever the compare can see the ordering at all
                return m.group(2) if m.group(2) in colset else m.group(0)

            resolved = []
            for t in terms:
                if re.fullmatch(r'\d+', t):
                    resolved.append(f'"{cols[int(t) - 1]}"')
                    continue
                t = re.sub(
                    r'\b([A-Za-z_][A-Za-z_0-9]*)\s*\.\s*'
                    r'([A-Za-z_][A-Za-z_0-9]*)\b',
                    strip_qualifier, t)
                # bare identifier ordering a column the projection
                # RENAMED (`SELECT cname AS "constraint" ... ORDER BY
                # cname`): map through the unique `term AS alias`
                if re.fullmatch(r'[A-Za-z_][A-Za-z_0-9]*', t) \
                        and t not in colset:
                    aliases = {a.strip('"') for a in re.findall(
                        rf'\b{t}\s+AS\s+("?[A-Za-z_][A-Za-z_0-9]*"?)',
                        body, re.IGNORECASE)}
                    aliases &= colset
                    if len(aliases) == 1:
                        t = f'"{aliases.pop()}"'
                resolved.append(t)

            def tie_groups(key_terms):
                return con.execute(
                    f"WITH __r AS ({body}) "
                    f"SELECT count(*) FROM ("
                    f"  SELECT 1 FROM (SELECT DISTINCT * FROM __r) "
                    f"  GROUP BY {', '.join(key_terms)} "
                    f"  HAVING count(*) > 1)").fetchone()[0]

            def binds(term):
                try:
                    con.execute(f"WITH __r AS ({body}) "
                                f"SELECT {term} FROM __r LIMIT 0")
                    return True
                except Exception:
                    return False

            evaluable = [t for t in resolved if binds(t)]
            if not evaluable:
                print(f"MANUAL {name} no ORDER BY term evaluable "
                      f"over the projection: {terms}")
                bad += 1
                continue
            n = tie_groups(evaluable)
            partial = len(evaluable) < len(resolved)
            if n == 0:
                # SOUND even when terms were dropped: refining a total
                # key with more terms keeps it total
                print(f"TOTAL {name}" + (" (evaluable-subset)" if partial else ""))
            elif partial:
                # the subset admits ties but the dropped terms might
                # break them — cannot conclude mechanically
                print(f"MANUAL {name} evaluable subset has ties "
                      f"(tie_groups={n}); dropped terms may totalize")
                bad += 1
            else:
                print(f"VIOLATION {name} tie_groups={n}")
                bad += 1
        except Exception as e:
            msg = str(e).split('\n')[0][:160]
            print(f"MANUAL {name} {msg}")
            bad += 1
        sys.stdout.flush()
    sys.exit(1 if bad else 0)


if __name__ == '__main__':
    main()

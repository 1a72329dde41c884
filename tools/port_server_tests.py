#!/usr/bin/env python3
"""Extract the reference's golden /query corpus from tests/server_test.go.

Walks every `func TestServer_*` block and statically resolves:
  - NewTest(db, rp)
  - test.writes entries (backtick/quoted literals, fmt.Sprintf with
    mustParseTime(...).UnixNano() [optionally /int64(time.Unit)] args,
    strings.Join over a local `writes := []string{...}`)
  - each Query{name, params, command, exp, skip}

Anything it cannot resolve statically (now(), helper calls, generated
loops) is dropped, with the drop reason counted. The output JSON is the
data for graft's ServerCorpusSpec replay — each entry carries its source
line so divergences can be audited against the reference directly.

Usage: python3 tools/port_server_tests.py [ref_go_file] [out_json]
"""
import json
import re
import sys
from datetime import datetime, timezone

REF = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/tests/server_test.go"
OUT = sys.argv[2] if len(sys.argv) > 2 else \
    "src/test/resources/server_corpus.json"

src = open(REF, encoding="utf-8").read()
lines = src.split("\n")

UNIT_NS = {
    "time.Nanosecond": 1,
    "time.Microsecond": 1000,
    "time.Millisecond": 1000000,
    "time.Second": 1000000000,
    "time.Minute": 60 * 1000000000,
    "time.Hour": 3600 * 1000000000,
}


def parse_rfc3339_ns(ts):
    # e.g. 2000-01-01T00:00:00Z / with fraction
    m = re.match(r"(\d{4}-\d\d-\d\d[T ]\d\d:\d\d:\d\d)(\.(\d+))?Z?$", ts)
    if not m:
        raise ValueError(f"bad ts {ts}")
    base = datetime.strptime(m.group(1), "%Y-%m-%dT%H:%M:%S") \
        .replace(tzinfo=timezone.utc)
    ns = int(base.timestamp()) * 10**9
    if m.group(3):
        frac = m.group(3)[:9].ljust(9, "0")
        ns += int(frac)
    return ns


class Unresolvable(Exception):
    pass


def strip_line_comments(s):
    """Remove Go // comments outside string literals (quote-aware: a
    url like "http://..." inside a quoted or backtick string survives,
    as do // sequences inside `exp` JSON)."""
    out, i, q = [], 0, None
    while i < len(s):
        c = s[i]
        if q:
            out.append(c)
            if c == "\\" and q == '"':
                if i + 1 < len(s):
                    out.append(s[i + 1])
                i += 2
                continue
            if c == q:
                q = None
        elif c in "\"`":
            q = c
            out.append(c)
        elif c == "/" and i + 1 < len(s) and s[i + 1] == "/":
            nl = s.find("\n", i)
            i = len(s) if nl < 0 else nl
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def split_top(s, sep):
    """Split a Go expression on a top-level separator char."""
    out, depth, cur, i, q = [], 0, [], 0, None
    while i < len(s):
        c = s[i]
        if q:
            cur.append(c)
            if c == "\\" and q == '"':
                cur.append(s[i + 1])
                i += 2
                continue
            if c == q:
                q = None
        elif c in "\"`":
            q = c
            cur.append(c)
        elif c in "([{":
            depth += 1
            cur.append(c)
        elif c in ")]}":
            depth -= 1
            cur.append(c)
        elif c == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def split_args(s):
    """Split a Go argument list on top-level commas."""
    return split_top(s, ",")


def eval_arg(a):
    """Resolve one Sprintf argument to a python value."""
    a = a.strip()
    m = re.match(
        r'mustParseTime\(time\.RFC3339Nano?,\s*"([^"]+)"\)\.UnixNano\(\)'
        r"(\s*/\s*int64\((time\.\w+)\))?$", a)
    if m:
        ns = parse_rfc3339_ns(m.group(1))
        if m.group(3):
            return ns // UNIT_NS[m.group(3)]
        return ns
    if a == "maxInt64()":  # server_helpers.go:683 — json.Marshal(^int64(0))
        return "9223372036854775807"
    if re.match(r"^-?\d+$", a):
        return int(a)
    m = re.match(r"^(-?\d+)\s*\*\s*(-?\d+)$", a)
    if m:
        return int(m.group(1)) * int(m.group(2))
    raise Unresolvable(f"arg: {a}")


def eval_str(expr):
    """Resolve a Go string expression to a python string."""
    expr = expr.strip().rstrip(",")
    # top-level `"a" + "b"` concatenation (possibly across lines)
    parts = split_top(expr, "+")
    if len(parts) > 1:
        return "".join(eval_str(p) for p in parts)
    # inline strings.Join([]string{e1, e2, ...}, "\n")
    m = re.match(r"strings\.Join\(\[\]string\{(.*)\}\s*,\s*(\"[^\"]*\")\)$",
                 expr, re.S)
    if m:
        sep = json.loads(m.group(2))
        return sep.join(eval_str(e) for e in split_args(m.group(1))
                        if e.strip())
    if expr.startswith("`"):
        if not expr.endswith("`"):
            raise Unresolvable(f"unterminated backtick: {expr[:50]}")
        return expr[1:-1]
    if expr.startswith('"'):
        # Go escapes ~ JSON escapes for the subset used here
        try:
            return json.loads(expr)
        except Exception:
            raise Unresolvable(f"quoted: {expr[:50]}")
    m = re.match(r"fmt\.Sprintf\((.*)\)$", expr, re.S)
    if m:
        args = split_args(m.group(1))
        fmtstr = eval_str(args[0])
        vals = [eval_arg(x) for x in args[1:]]
        # replace verbs in order
        out, vi = [], 0
        i = 0
        while i < len(fmtstr):
            c = fmtstr[i]
            if c == "%" and i + 1 < len(fmtstr):
                v = fmtstr[i + 1]
                if v == "%":
                    out.append("%")
                    i += 2
                    continue
                if v in "dsv":
                    out.append(str(vals[vi]))
                    vi += 1
                    i += 2
                    continue
                raise Unresolvable(f"verb %{v}")
            out.append(c)
            i += 1
        if vi != len(vals):
            raise Unresolvable("verb/arg count mismatch")
        return "".join(out)
    raise Unresolvable(f"expr: {expr[:60]}")


def find_funcs():
    """Brace-match each test func with a real Go lexer subset: double-
    quoted strings (escapes), backtick strings (no escapes), rune
    literals (escapes), // line comments and /* */ block comments. The
    naive version treated a comment apostrophe (\"don't\") as an open
    quote and swallowed every following func into the current one."""
    for m in re.finditer(r"^func (TestServer_\w+)\(t \*testing\.T\) \{",
                         src, re.M):
        start = m.start()
        depth, j = 0, src.index("{", start)
        while j < len(src):
            c = src[j]
            if c == "/" and j + 1 < len(src) and src[j + 1] == "/":
                j = src.index("\n", j) if "\n" in src[j:] else len(src)
                continue
            if c == "/" and j + 1 < len(src) and src[j + 1] == "*":
                j = src.index("*/", j) + 2
                continue
            if c == '"' or c == "'":
                k = j + 1
                while k < len(src):
                    if src[k] == "\\":
                        k += 2
                        continue
                    if src[k] == c:
                        break
                    k += 1
                j = k + 1
                continue
            if c == "`":
                j = src.index("`", j + 1) + 1
                continue
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        yield m.group(1), src[:start].count("\n") + 1, src[start:j + 1]


def parse_struct_fields(body):
    """Parse `field: value,` pairs of one Query literal body."""
    fields = {}
    for fm in re.finditer(r"^\s*(\w+)\s*:\s*", body, re.M):
        key = fm.group(1)
        rest = body[fm.end():]
        # value extends to the top-level comma/newline
        depth, i, q = 0, 0, None
        while i < len(rest):
            c = rest[i]
            if q:
                if c == "\\" and q == '"':
                    i += 2
                    continue
                if c == q:
                    q = None
            elif c in "\"`":
                q = c
            elif c in "([{":
                depth += 1
            elif c in ")]}":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            i += 1
        fields[key] = rest[:i].strip()
    return fields


def parse_params(expr):
    """url.Values{"db": []string{"db0"}, ...} -> dict"""
    if not expr.startswith("url.Values{"):
        raise Unresolvable(f"params: {expr[:40]}")
    inner = expr[len("url.Values{"):-1]
    out = {}
    for pm in re.finditer(r'"([^"]+)"\s*:\s*\[\]string\{"([^"]*)"\}', inner):
        out[pm.group(1)] = pm.group(2)
    return out


# Loop-generated write sets, synthesized to match the Go loops verbatim
# (generateFloat = float(i), generateBool = i%2==0, generateString =
# "abc%d"; Go %f renders 6 decimals, %t true/false).
def _merge_many():  # server_test.go:2087
    return "\n".join(
        f"cpu,host=server_{i} value=22 {j * 10**9}"
        for i in range(1, 11) for j in range(1, 5 + i % 3))


def _complex_aggregate():  # server_test.go:4358
    return "\n".join(
        f'cpu,region=region_{i},az=az_{i} v1={k}i,v2={float(k):.6f},'
        f'v3={"true" if k % 2 == 0 else "false"},v4="abc{k}" {k * 10**9}'
        for i in range(10) for j in range(2048) for k in [i * 2048 + j])


def _null_group():  # server_test.go:5154 (per-i field-null patterns)
    out = []
    for i in range(6):
        for j in range(2048):
            k = i * 2048 + j
            v1 = f"v1={k}i"
            v2 = f"v2={float(k):.6f}"
            v3 = f'v3={"true" if k % 2 == 0 else "false"}'
            v4 = f'v4="abc{k}"'
            fields = ([v1, v2, v3, v4] if i < 2 else
                      [v2, v3, v4] if i == 2 else
                      [v1, v3, v4] if i == 3 else
                      [v1, v2, v4] if i == 4 else
                      [v1, v2, v3])
            out.append(f'cpu,region=region_{i},az=az_{i} '
                       f'{",".join(fields)} {k * 10**9}')
    return "\n".join(out)


SYNTH_WRITES = {
    "TestServer_Query_MergeMany": _merge_many,
    "TestServer_Query_Complex_Aggregate": _complex_aggregate,
    "TestServer_Query_Null_Group": _null_group,
}

stats = {"funcs": 0, "kept_funcs": 0, "queries": 0, "kept_queries": 0,
         "skipped_flag": 0, "drop": {}}
corpus = []


def write_bodies(block):
    """Brace-match each &Write{...} (a non-greedy regex truncates at
    the first inner `}` of e.g. []string{...})."""
    for wm in re.finditer(r"&Write\{", block):
        k, depth, q = wm.end(), 1, None
        while k < len(block) and depth > 0:
            c = block[k]
            if q:
                if c == "\\" and q == '"':
                    k += 2
                    continue
                if c == q:
                    q = None
            elif c in "\"`":
                q = c
            elif c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            k += 1
        yield block[wm.end():k - 1]


def brace_inner_at(body, i):
    """Text between the brace opened just before index `i` and its
    match (quote-aware)."""
    depth, q, j = 1, None, i
    while j < len(body) and depth > 0:
        c = body[j]
        if q:
            if c == "\\" and q == '"':
                j += 2
                continue
            if c == q:
                q = None
        elif c in "\"`":
            q = c
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        j += 1
    return body[i:j - 1]


def brace_block(body, open_re):
    """Return the text between the braces opened by `open_re` (quote-
    aware), or None when the pattern is absent."""
    m = re.search(open_re, body)
    if not m:
        return None
    return brace_inner_at(body, m.end())


def parse_writes(wblock, db, rp, fname, resolve_list, drop):
    """&Write{...} entries of one Writes{...} block -> [{db,rp,data}],
    or None when any entry is statically unresolvable. `resolve_list`
    maps a local []string variable name to its (position-correct)
    literal value, or None/("UNRESOLVABLE", …)."""
    writes = []
    for wbody in write_bodies(wblock):
        wf = parse_struct_fields(wbody)
        if set(wf) - {"data", "db", "rp"}:
            drop("write fields " + ",".join(sorted(set(wf) - {"data"})))
            return None
        try:
            wdb = eval_str(wf["db"]) if "db" in wf else db
            wrp = eval_str(wf["rp"]) if "rp" in wf else rp
        except Unresolvable as e:
            drop("write db/rp: " + str(e)[:40])
            return None
        dexpr = wf.get("data", "")
        jm = re.match(r"strings\.Join\((\w+),\s*\"\\n\"\)$", dexpr.strip())
        if jm:
            local_writes = resolve_list(jm.group(1))
            if fname in SYNTH_WRITES and jm.group(1) == "writes":
                writes.append({"db": wdb, "rp": wrp,
                               "data": SYNTH_WRITES[fname]()})
            # loop-generated writes leave the literal list empty — that's
            # unresolvable, not an empty write
            elif isinstance(local_writes, tuple) or not local_writes:
                drop("unresolvable writes[]")
                return None
            else:
                writes.append({"db": wdb, "rp": wrp,
                               "data": "\n".join(local_writes)})
        else:
            try:
                writes.append({"db": wdb, "rp": wrp,
                               "data": eval_str(dexpr)})
            except Unresolvable as e:
                drop("write: " + str(e)[:40])
                return None
    return writes


def parse_queries(body, drop):
    """Every Query literal in `body` -> [{name,command,params,exp}].
    Matches entries whose first field is any of name/params/command
    (server_test.go's Subqueries entries have no name)."""
    queries = []
    for qm in re.finditer(
            r"\{\s*\n(\s*(?:name|params|command)\s*:.*?)\n\t*\},",
            body, re.S):
        stats["queries"] += 1
        qf = parse_struct_fields(qm.group(1))
        if "command" not in qf or "exp" not in qf:
            drop("query missing command/exp")
            continue
        if qf.get("skip", "").startswith("true"):
            stats["skipped_flag"] += 1
            continue
        if "pattern" in qf or "exps" in qf or "repeat" in qf \
                or "path" in qf or "fail" in qf:
            drop("query special fields")
            continue
        try:
            command = eval_str(qf["command"])
            exp = eval_str(qf["exp"])
            params = parse_params(qf["params"]) if "params" in qf else {}
            name = eval_str(qf["name"]) if "name" in qf else ""
        except Unresolvable as e:
            drop("query: " + str(e)[:40])
            continue
        stats["kept_queries"] += 1
        queries.append({"name": name, "command": command,
                        "params": params, "exp": exp})
    return queries


# ---- pass 1: inline TestServer_* funcs in server_test.go ----

suite_loads = {}  # suite key -> (func name, line)

for fname, fline, body in find_funcs():
    stats["funcs"] += 1
    body = strip_line_comments(body)

    def drop(reason):
        stats["drop"].setdefault(reason, []).append(f"{fname}:{fline}")

    # the func header may create the database via the Go API before any
    # query runs (CreateDatabaseAndRetentionPolicy) — queries indexed
    # before a gated init still expect it to exist
    precreate = [f"{m2.group(1)}/{m2.group(2)}" for m2 in re.finditer(
        r'CreateDatabaseAndRetentionPolicy\(\s*"([^"]+)",\s*'
        r'NewRetentionPolicySpec\("([^"]+)"', body)]

    # some funcs gate test.init(s) on a later query index
    # (`if i == 2 { test.init(s) }` — ShowSeries runs CREATE/DROP first)
    im = re.search(r"if i == (\d+)\s*\{\s*\n?\s*if err := test\.init", body)
    init_at = int(im.group(1)) if im else 0

    lm = re.search(r'tests\.load\(t,\s*"([^"]+)"\)', body)
    if lm:
        # the loading func may pre-create the suite's database via the
        # Go API (s.CreateDatabase) before running queries
        pre = bool(re.search(r"s\.CreateDatabase\(", body))
        suite_loads[lm.group(1)] = (fname, fline, pre)

    # NewTest args — a later `test.db = "..."` / `test.rp = "..."`
    # reassignment (Write_OutOfOrder) overrides the constructor pair
    tm = re.search(r'NewTest\("([^"]*)",\s*"([^"]*)"\)', body)
    db, rp = (tm.group(1), tm.group(2)) if tm else ("db0", "rp0")
    dbre = re.search(r'test\.db\s*=\s*"([^"]*)"', body)
    rpre = re.search(r'test\.rp\s*=\s*"([^"]*)"', body)
    if dbre:
        db = dbre.group(1)
    if rpre:
        rp = rpre.group(1)
    db = db or "db0"
    rp = rp or "rp0"

    # every local `<name> := []string{ ... }` with its position — a
    # test may declare writes/writes1/writes2 and feed them through
    # SEQUENTIAL `test.writes = Writes{…}` + writeTestData steps
    # (Query_OutOfOrder writes three batches); each Join(<name>)
    # resolves against the latest assignment before its block
    str_lists = []
    for m2 in re.finditer(r"(\w+)\s*:?=\s*\[\]string\{", body):
        inner = brace_inner_at(body, m2.end())
        try:
            val = [eval_str(e) for e in split_args(inner) if e.strip()]
        except Unresolvable as e:
            val = ("UNRESOLVABLE", str(e))
        str_lists.append((m2.start(), m2.group(1), val))

    wblocks = [(m2.start(), brace_inner_at(body, m2.end()))
               for m2 in re.finditer(r"test\.writes\s*=\s*Writes\{", body)]
    if not wblocks:
        if not lm:
            drop("no test.writes")
        continue
    writes = []
    for wpos, wblock in wblocks:
        def resolve_list(var, _pos=wpos):
            cands = [v for (p, n, v) in str_lists if n == var and p < _pos]
            return cands[-1] if cands else None
        ws = parse_writes(wblock, db, rp, fname, resolve_list, drop)
        if ws is None:
            writes = None
            break
        writes.extend(ws)
    if writes is None or not writes:
        if writes is not None:
            drop("no writes parsed")
        continue

    queries = parse_queries(body, drop)
    if not queries:
        drop("no queries kept")
        continue

    stats["kept_funcs"] += 1
    corpus.append({"func": fname, "line": fline, "db": db, "rp": rp,
                   "init_at": init_at,
                   "precreate": (precreate if init_at > 0 else []),
                   "writes": writes, "queries": queries})

# ---- pass 2: the shared suite registry (server_suite.go), for the
# keys server_test.go actually loads (tests.load). Entries the
# reference never runs are NOT replayed — they may predate the engine.

SUITE = REF.replace("server_test.go", "server_suite.go")
try:
    suite_src = strip_line_comments(open(SUITE, encoding="utf-8").read())
except OSError:
    suite_src = ""

for sm in re.finditer(r'tests\["([^"]+)"\] = Test\{', suite_src):
    key = sm.group(1)
    if key not in suite_loads:
        continue
    fname, fline, precreate = suite_loads[key]
    sline = suite_src[:sm.start()].count("\n") + 1

    def drop(reason):
        stats["drop"].setdefault(reason, []).append(
            f"{fname}(suite:{key}):{fline}")

    body = brace_block(suite_src[sm.start():], r"= Test\{")
    fields = parse_struct_fields(body)
    try:
        db = eval_str(fields["db"]) if "db" in fields else "db0"
        rp = eval_str(fields["rp"]) if "rp" in fields else "rp0"
    except Unresolvable as e:
        drop("suite db/rp: " + str(e)[:40])
        continue
    writes = []
    wblock = brace_block(body, r"writes:\s*Writes\{")
    if wblock is not None:
        writes = parse_writes(wblock, db, rp, fname, lambda _v: None, drop)
        if writes is None:
            continue
    queries = parse_queries(body, drop)
    if not queries:
        drop("suite: no queries kept")
        continue
    stats["kept_funcs"] += 1
    corpus.append({"func": fname, "line": fline, "db": db, "rp": rp,
                   "suite": f"{key} (server_suite.go:{sline})",
                   "precreate": ([db] if precreate else []),
                   "writes": writes, "queries": queries})

corpus.sort(key=lambda f: f["line"])

with open(OUT, "w", encoding="utf-8") as f:
    json.dump(corpus, f, indent=1)

stats["drop"] = {k: len(v) if len(v) > 4 else v
                 for k, v in sorted(stats["drop"].items())}
print(json.dumps(stats, indent=2))
print(f"kept {stats['kept_funcs']}/{stats['funcs']} funcs, "
      f"{stats['kept_queries']}/{stats['queries']} queries -> {OUT}")

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


def split_args(s):
    """Split a Go argument list on top-level commas."""
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
        elif c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


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
    if re.match(r"^-?\d+$", a):
        return int(a)
    m = re.match(r"^(-?\d+)\s*\*\s*(-?\d+)$", a)
    if m:
        return int(m.group(1)) * int(m.group(2))
    raise Unresolvable(f"arg: {a}")


def eval_str(expr):
    """Resolve a Go string expression to a python string."""
    expr = expr.strip().rstrip(",")
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
    for m in re.finditer(r"^func (TestServer_\w+)\(t \*testing\.T\) \{",
                         src, re.M):
        start = m.start()
        # brace-match to the func end
        depth, i, q = 0, src.index("{", start), None
        j = i
        while j < len(src):
            c = src[j]
            if q:
                if c == "\\":
                    j += 2
                    continue
                if c == q:
                    q = None
            elif c in "\"`'":
                q = c
            elif c == "{":
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

for fname, fline, body in find_funcs():
    stats["funcs"] += 1

    def drop(reason):
        stats["drop"][reason] = stats["drop"].get(reason, 0) + 1

    # NewTest args
    tm = re.search(r'NewTest\("([^"]*)",\s*"([^"]*)"\)', body)
    db, rp = (tm.group(1), tm.group(2)) if tm else ("db0", "rp0")
    db = db or "db0"
    rp = rp or "rp0"

    # local writes := []string{ ... }
    local_writes = None
    wm = re.search(r"writes\s*:?=\s*\[\]string\{", body)
    if wm:
        i = wm.end()
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
        try:
            local_writes = [eval_str(e) for e in
                            split_args(body[i:j - 1]) if e.strip()]
        except Unresolvable as e:
            local_writes = ("UNRESOLVABLE", str(e))

    # test.writes = Writes{ &Write{...}, ... }
    writes = []
    ok = True
    twm = re.search(r"test\.writes\s*=\s*Writes\{", body)
    if not twm:
        drop("no test.writes")
        continue
    i = twm.end()
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
    wblock = body[i:j - 1]
    for wm2 in re.finditer(r"&Write\{(.*?)\}(?:,|\s*$)", wblock, re.S):
        wf = parse_struct_fields(wm2.group(1))
        if set(wf) - {"data", "db", "rp"}:
            ok = False
            drop("write fields " + ",".join(sorted(set(wf) - {"data"})))
            break
        dexpr = wf.get("data", "")
        if re.match(r"strings\.Join\(writes,\s*\"\\n\"\)$", dexpr.strip()):
            if fname in SYNTH_WRITES:
                writes.append({"db": db, "rp": rp,
                               "data": SYNTH_WRITES[fname]()})
            # loop-generated writes leave the literal list empty — that's
            # unresolvable, not an empty write
            elif isinstance(local_writes, tuple) or not local_writes:
                ok = False
                drop("unresolvable writes[]")
                break
            else:
                writes.append({"db": db, "rp": rp,
                               "data": "\n".join(local_writes)})
        else:
            try:
                writes.append({"db": db, "rp": rp, "data": eval_str(dexpr)})
            except Unresolvable as e:
                ok = False
                drop("write: " + str(e)[:40])
                break
    if not ok or not writes:
        if ok:
            drop("no writes parsed")
        continue

    # queries: []*Query{ {...}, {...} } via addQueries
    queries = []
    for qm in re.finditer(
            r"\{\s*\n(\s*name\s*:.*?)\n\t*\},", body, re.S):
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
    if not queries:
        drop("no queries kept")
        continue

    stats["kept_funcs"] += 1
    corpus.append({"func": fname, "line": fline, "db": db, "rp": rp,
                   "writes": writes, "queries": queries})

with open(OUT, "w", encoding="utf-8") as f:
    json.dump(corpus, f, indent=1)

print(json.dumps(stats, indent=2))
print(f"kept {stats['kept_funcs']}/{stats['funcs']} funcs, "
      f"{stats['kept_queries']}/{stats['queries']} queries -> {OUT}")

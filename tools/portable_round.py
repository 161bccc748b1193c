#!/usr/bin/env python3
"""One-shot source rewrite: make rounding portable across Spark and DuckDB.
- Scala code: round(expr, n)  ->  pround(expr, n)   (graft.functions.Portable)
- Oracle SQL: ROUND(expr, n)  ->  FLOOR((expr) * 10^n + 0.5) / 10^n
Handles nested parens via balance counting. Driver-side tooling only."""
import re, sys, pathlib

def split_args(s):
    """s = inside of ROUND(...); return (expr, scale) split on top-level comma."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == '(':
            depth += 1
        elif ch == ')':
            depth -= 1
        elif ch == ',' and depth == 0:
            return s[:i], s[i+1:].strip()
    raise ValueError("no top-level comma in: " + s)

def find_call(text, start, name):
    """Find name( starting at/after start; return (open_idx, close_idx) of parens."""
    i = text.find(name + "(", start)
    if i < 0:
        return None
    o = i + len(name)
    depth = 0
    for j in range(o, len(text)):
        if text[j] == '(':
            depth += 1
        elif text[j] == ')':
            depth -= 1
            if depth == 0:
                return i, o, j
    raise ValueError("unbalanced")

def rewrite_sql_rounds(text):
    out, pos = [], 0
    while True:
        hit = find_call(text, pos, "ROUND")
        if not hit:
            out.append(text[pos:])
            break
        i, o, c = hit
        expr, scale = split_args(text[o+1:c])
        n = int(scale)
        f = 10 ** n
        out.append(text[pos:i])
        out.append(f"FLOOR(({expr.strip()}) * {f} + 0.5) / {f}")
        pos = c + 1
    return "".join(out)

def rewrite_scala_rounds(text):
    # only lowercase round( calls (Spark functions.round); SQL uses ROUND(
    return re.sub(r"(?<![\w.])round\(", "pround(", text)

def main():
    for path in sys.argv[1:]:
        p = pathlib.Path(path)
        t = p.read_text()
        # split into string literals (triple-quoted SQL) vs code: rewrite SQL
        # inside triple quotes, scala-round outside.
        parts = re.split(r'(""".*?""")', t, flags=re.S)
        for k in range(len(parts)):
            if parts[k].startswith('"""'):
                parts[k] = rewrite_sql_rounds(parts[k])
            else:
                parts[k] = rewrite_scala_rounds(parts[k])
        t2 = "".join(parts)
        if "pround(" in t2 and "import graft.functions.Portable.pround" not in t2:
            t2 = t2.replace("import graft.functions.TextOps",
                            "import graft.functions.Portable.pround\nimport graft.functions.TextOps", 1)
            if "import graft.functions.Portable.pround" not in t2:
                # fall back: insert after package-adjacent graft import
                t2 = re.sub(r"(import graft\.\{[^}]*\}\n)",
                            r"\1import graft.functions.Portable.pround\n", t2, count=1)
        if t2 != t:
            p.write_text(t2)
            print("rewrote", path)

if __name__ == "__main__":
    main()

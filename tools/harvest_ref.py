#!/usr/bin/env python3
"""Extract assertQuery-family statements from a reference test Java file.

Handles Java string-literal concatenation ("a " + "b"), multi-line calls,
escapes. Emits TSV: kind<TAB>actual<TAB>expected (expected empty for
single-arg assertQuery / assertQueryOrdered self-checks).

Usage: python3 tools/harvest_ref.py <File.java> [method-name-filter]
"""
import re
import sys

SRC = open(sys.argv[1], encoding="utf-8").read()
METHOD_FILTER = sys.argv[2] if len(sys.argv) > 2 else None

CALLS = ("assertQueryOrdered", "assertQuery", "assertOrderedQuery")


def java_string_at(s, i):
    """Parse a Java string literal starting at s[i]=='\"'. Returns (value, j)."""
    assert s[i] == '"'
    out = []
    i += 1
    while True:
        c = s[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\\":
            n = s[i + 1]
            mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "'": "'"}
            if n in mapped:
                out.append(mapped[n])
                i += 2
            elif n == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
            else:
                out.append(n)
                i += 2
        else:
            out.append(c)
            i += 1


def parse_args(s, i):
    """Parse a parenthesized Java arg list starting at s[i]=='('.
    Returns (list_of_args, j) where each arg is either a concatenated string
    value (if composed only of string literals and +) or None (non-literal)."""
    assert s[i] == "("
    depth = 1
    i += 1
    args = []
    cur_parts = []
    cur_nonliteral = False
    while depth > 0:
        c = s[i]
        if c == '"':
            val, i = java_string_at(s, i)
            cur_parts.append(val)
            continue
        if c == "(":
            depth += 1
            cur_nonliteral = True
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(None if cur_nonliteral or not cur_parts else "".join(cur_parts))
                return args, i + 1
            # closing an inner paren: keep scanning
        elif c == "," and depth == 1:
            args.append(None if cur_nonliteral or not cur_parts else "".join(cur_parts))
            cur_parts = []
            cur_nonliteral = False
        elif c == "+" or c in " \n\r\t":
            pass
        elif c == "/" and s[i + 1] == "/":
            i = s.index("\n", i)
        else:
            cur_nonliteral = True
        i += 1
    return args, i


# map positions to enclosing test-method names
methods = [(m.start(), m.group(1)) for m in
           re.finditer(r"public void (\w+)\s*\(", SRC)]


def method_of(pos):
    name = ""
    for p, n in methods:
        if p < pos:
            name = n
        else:
            break
    return name


for m in re.finditer(r"\b(assertQueryOrdered|assertQuery|assertOrderedQuery)\s*\(", SRC):
    kind = m.group(1)
    meth = method_of(m.start())
    if METHOD_FILTER and METHOD_FILTER.lower() not in meth.lower():
        continue
    try:
        args, _ = parse_args(SRC, m.end() - 1)
    except Exception:
        continue
    if not args or args[0] is None:
        continue
    actual = args[0]
    expected = args[1] if len(args) > 1 and args[1] is not None else ""
    # session-arg overload: assertQuery(session, sql, ...) — first literal arg
    # is still the sql; non-literal session arg yields args[0] None (skipped).
    one = lambda s: s.replace("\t", " ").replace("\n", " ").strip()
    print(f"{meth}\t{kind}\t{one(actual)}\t{one(expected)}")

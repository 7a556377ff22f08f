"""ECMA-262 regex audit + translation (SURVEY.md §4.2 item 5).

The reference compiles JSON-Schema ``pattern`` strings with an ECMA-262
engine per instance (`/root/reference/json_schema_rs/src/validator/
mod.rs:259-277`, the ``regress`` crate — ECMAScript semantics including
Annex B web-compat extensions, NO flags). This engine evaluates patterns
with Java regex (``rlike``, the codegen hot path) or Python ``re`` (the
pandas/pyvalidator path) — three different dialects. This module closes
the gap: it **audits** a pattern under ECMA-262(+Annex B) rules and
**translates** it into Java- and Python-dialect patterns with identical
match semantics, so the engine's verdict on every row matches the
reference's.

Divergences handled (each has a test in tests/test_ecma_regex.py):

======================  =============  ==============  =================
construct               ECMA (+AnnexB) Java naive      Python naive
======================  =============  ==============  =================
``a{`` dangling brace   literal ``{``  COMPILE ERROR   literal
``$``                   absolute end   also before \\n  also before \\n
``.``                   not \\n\\r\\u2028 also not \\u0085 only not \\n
``\\s``                  Unicode + BOM  ASCII only      Unicode, no BOM
``\\d`` ``\\w`` ``\\b``     ASCII          ASCII           Unicode
``\\cJ``                 control char   control char    COMPILE ERROR
``\\c5`` (no letter)     ``\\`` then ``c5`` COMPILE ERROR  COMPILE ERROR
``(?<name>x)``          named group    named group     needs ``?P<``
``(?i)`` inline flag    SYNTAX ERROR   accepted        accepted
``\\p`` (no u flag)      literal ``p``  property class  COMPILE ERROR
``\\q`` identity escape  literal ``q``  COMPILE ERROR   COMPILE ERROR
``[]`` / ``[^]``        never / any    COMPILE ERROR   COMPILE ERROR
``\\8`` (no 8th group)   literal ``8``  COMPILE ERROR   COMPILE ERROR
``(?=x)*`` quantified   allowed        group-wrapped   COMPILE ERROR
``(^a?){2}`` empty-iter counts to min  loop aborts     follows ECMA
``\\B`` in empty string  matches        matches (spelled) never matches
``(a)?\\1`` unset backref matches empty  FAILS           FAILS
======================  =============  ==============  =================

The last three rows were found by the random-pattern cross-dialect
fuzzer (tests/test_differential_fuzz.py + offline sweeps):

- Empty iterations: ECMA's RepeatMatcher counts zero-width iterations
  toward a quantifier's MINIMUM, Java's loop aborts on them — a NULLABLE
  group containing a position-dependent element (anchor / boundary /
  backref / lookaround) under a min>=2 quantifier is unsound in Java and
  is routed to the Python/pandas path (``java=None``), which follows
  ECMA.
- ``\\B``: CPython's native ``\\B`` never matches in an empty string
  (quirk through 3.11) while ECMA's does — both dialects get the
  spelled-out lookaround form.
- Unset-group backreference: ECMA matches empty, both dialects fail the
  backref. The translator tracks per-alternative definitely-matched
  group sets; a backreference outside that set flags BOTH dialects and
  the compiler raises :class:`UnsupportedPatternError` loudly.

Patterns using lookbehind (ECMA allows variable length; Java only
bounded, Python only fixed) leave the Java hot path; if Python cannot
express them either, both translations come back None and the compiler
raises :class:`UnsupportedPatternError` loudly instead of silently
diverging from the reference.

Astral characters: browser JS (no ``u`` flag) matches per UTF-16 code
UNIT, but the parity target is the reference's ``regress`` crate over
Rust ``&str`` — which, like Java and Python strings, has no surrogate
halves and matches per Unicode scalar. ``.`` matching one astral char is
therefore correct HERE even though a browser would need two dots.

Python translations must be compiled with :data:`PY_FLAGS` (``re.ASCII``
makes ``\\d \\w \\b`` match ECMA's non-unicode semantics; ``\\s`` is
rewritten textually because ECMA whitespace is *neither* ASCII nor
Python's Unicode set).
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass
from functools import lru_cache

PY_FLAGS = _re.ASCII

# ECMA WhiteSpace (tab, vt, ff, sp, nbsp, BOM, category Zs) + LineTerminator
# (lf, cr, ls, ps) — ECMA-262 §22.2.2.9 CharacterClassEscape `s`.
_ECMA_WS = ("\\t\\n\\x0b\\f\\r \\u00a0\\u1680\\u2000-\\u200a"
            "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff")
_DOT_CLASS = "[^\\n\\r\\u2028\\u2029]"       # ECMA `.` (no s flag)
_S_CLASS = f"[{_ECMA_WS}]"
_NOT_S_CLASS = f"[^{_ECMA_WS}]"

_SYNTAX_CHARS = set("^$\\.*+?()[]{}|/")
_JAVA_CLASS_META = set("\\]^[&-")             # escape inside [..] for Java
_PY_CLASS_META = set("\\]^[-")

_HEX = set("0123456789abcdefABCDEF")
_DEC = set("0123456789")
_OCT = set("01234567")

# sentinel emitted for `\S` inside a character class — not expressible in
# either target dialect when combined with other class members
_NEG_S = "\x00NEG_S\x00"


class _Invalid(Exception):
    """Pattern is not a valid ECMA-262(+Annex B) regex."""


@dataclass(frozen=True)
class EcmaPattern:
    source: str
    valid: bool
    java: str | None      # Java-dialect translation (rlike), or None
    python: str | None    # Python-re translation (compile with PY_FLAGS)


class UnsupportedPatternError(Exception):
    """Valid ECMA-262 pattern that neither target engine can express
    (e.g. variable-length lookbehind). Raised loudly at plan time rather
    than silently diverging from the reference."""

    def __init__(self, pattern: str) -> None:
        super().__init__(
            f"pattern {pattern!r} is valid ECMA-262 but not expressible in "
            "this engine's Java/Python regex dialects; rewrite the pattern "
            "or validate this column via the JSON-mode pandas path")
        self.pattern = pattern


def _esc_lit(ch: str, meta: set[str]) -> str:
    o = ord(ch)
    if ch in meta:
        return "\\" + ch
    if o < 0x20 or o == 0x7f:
        return f"\\x{o:02x}"
    return ch


def _esc_out(ch: str) -> tuple[str, str]:
    """Literal char outside a class -> (java, python)."""
    j = _esc_lit(ch, _SYNTAX_CHARS)
    return j, j


def _esc_in(ch: str) -> tuple[str, str]:
    """Literal char inside a class -> (java, python)."""
    return _esc_lit(ch, _JAVA_CLASS_META), _esc_lit(ch, _PY_CLASS_META)


class _Scanner:
    def __init__(self, src: str) -> None:
        self.src = src
        self.i = 0
        self.n = len(src)

    def peek(self, k: int = 0) -> str:
        j = self.i + k
        return self.src[j] if j < self.n else ""

    def take(self) -> str:
        ch = self.src[self.i]
        self.i += 1
        return ch

    def eof(self) -> bool:
        return self.i >= self.n


def _prescan(src: str) -> tuple[int, set[str]]:
    """(capturing-group count, named-group names) — needed before the main
    pass: ``\\N`` is a backreference iff N <= total count (else Annex B
    octal/identity), and ``\\k<name>``/named groups may reference forward."""
    count, names = 0, set()
    i, n, in_class = 0, len(src), False
    while i < n:
        ch = src[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            nxt = src[i + 1] if i + 1 < n else ""
            if nxt != "?":
                count += 1
            elif src[i + 2:i + 3] == "<" and src[i + 3:i + 4] not in ("=", "!"):
                count += 1
                j = src.find(">", i + 3)
                if j > 0:
                    names.add(src[i + 3:j])
        i += 1
    return count, names


def _parse_class_char(s: _Scanner) -> tuple[int | None, str, str, bool]:
    """One ClassAtom. Returns ``(codepoint, java, python, is_multi)``:
    ``codepoint`` is set for single characters (range endpoints); multi-
    char class escapes (``\\w`` etc.) have ``is_multi`` and no codepoint."""
    ch = s.take()
    if ch != "\\":
        j, p = _esc_in(ch)
        return ord(ch), j, p, False
    if s.eof():
        raise _Invalid("trailing backslash in class")
    e = s.take()
    if e in "dDwW":
        if e == "d":
            return None, "0-9", "0-9", True
        if e == "D":
            # with Java defaults / re.ASCII both mean "not [0-9]" = ECMA
            return None, "\\D", "\\D", True
        if e == "w":
            return None, "a-zA-Z0-9_", "a-zA-Z0-9_", True
        return None, "\\W", "\\W", True
    if e == "s":
        return None, _ECMA_WS, _ECMA_WS, True
    if e == "S":
        return None, _NEG_S, _NEG_S, True    # resolved by _parse_class
    if e == "b":
        return 0x08, "\\x08", "\\x08", False
    if e in "fnrtv":
        cp = {"f": 0x0c, "n": 0x0a, "r": 0x0d, "t": 0x09, "v": 0x0b}[e]
        return cp, f"\\x{cp:02x}", f"\\x{cp:02x}", False
    if e == "x":
        h = s.peek() + s.peek(1)
        if len(h) == 2 and all(c in _HEX for c in h):
            s.take(); s.take()
            return int(h, 16), f"\\x{h}", f"\\x{h}", False
        j, p = _esc_in("x")           # Annex B identity escape
        return ord("x"), j, p, False
    if e == "u":
        h = "".join(s.peek(k) for k in range(4))
        if len(h) == 4 and all(c in _HEX for c in h):
            for _ in range(4):
                s.take()
            return int(h, 16), f"\\u{h}", f"\\u{h}", False
        j, p = _esc_in("u")
        return ord("u"), j, p, False
    if e == "c":
        nxt = s.peek()
        if nxt.isascii() and (nxt.isalpha() or nxt in _DEC or nxt == "_"):
            s.take()                  # Annex B ClassControlLetter: 0-9/_ too
            cp = ord(nxt) % 32
            return cp, f"\\x{cp:02x}", f"\\x{cp:02x}", False
        # Annex B `\ [lookahead = c]`: the `\` is a literal; the `c` is
        # re-parsed as its own ClassAtom on the next loop turn
        s.i -= 1
        return ord("\\"), "\\\\", "\\\\", False
    if e == "0" and s.peek() not in _DEC:
        return 0, "\\x00", "\\x00", False
    if e in "01234567":
        digits = e                    # Annex B LegacyOctalEscapeSequence
        while len(digits) < 3 and s.peek() in _OCT \
                and int(digits + s.peek(), 8) <= 0xFF:
            digits += s.take()
        cp = int(digits, 8)
        return cp, f"\\x{cp:02x}", f"\\x{cp:02x}", False
    # Annex B IdentityEscape (incl. \8 \9): the character itself
    j, p = _esc_in(e)
    return ord(e), j, p, False


def _parse_class(s: _Scanner) -> tuple[str, str, bool]:
    """Parse ``[...]`` (the ``[`` is consumed).
    Returns (java, python, supported)."""
    negated = False
    if s.peek() == "^":
        s.take()
        negated = True
    if s.peek() == "]":               # [] never matches; [^] matches all
        s.take()
        return ("(?!)", "(?!)", True) if not negated \
            else ("[\\s\\S]", "[\\s\\S]", True)
    jparts: list[str] = []
    pparts: list[str] = []
    n_items = 0
    neg_s_seen = False
    while True:
        if s.eof():
            raise _Invalid("unterminated character class")
        if s.peek() == "]":
            s.take()
            break
        cp1, j1, p1, multi1 = _parse_class_char(s)
        n_items += 1
        if j1 == _NEG_S:
            # \S contributes via the set-algebra construction below, not
            # as a class member (neither dialect's \S is ECMA's)
            neg_s_seen = True
            if s.peek() == "-" and s.peek(1) not in ("]", ""):
                s.take()              # Annex B: dash after escape literal
                jparts.append("\\-")
                pparts.append("\\-")
            continue
        if s.peek() == "-" and s.peek(1) not in ("]", ""):
            s.take()                  # candidate range
            if multi1:
                # Annex B: `-` after a class escape is a literal dash
                jparts.append(j1 + "\\-")
                pparts.append(p1 + "\\-")
                continue
            cp2, j2, p2, multi2 = _parse_class_char(s)
            n_items += 1
            if j2 == _NEG_S:
                # Annex B: dash BEFORE a class escape is a literal dash
                neg_s_seen = True
                jparts.append(j1 + "\\-")
                pparts.append(p1 + "\\-")
                continue
            if multi2:
                jparts.append(j1 + "\\-" + j2)
                pparts.append(p1 + "\\-" + p2)
                continue
            if cp1 is None or cp2 is None or cp1 > cp2:
                raise _Invalid("invalid class range")
            jparts.append(f"{j1}-{j2}")
            pparts.append(f"{p1}-{p2}")
        else:
            jparts.append(j1)
            pparts.append(p1)
    if neg_s_seen:
        # \S has no faithful class-member form in either dialect (Java \S
        # and ASCII \S both mis-handle NBSP and the unicode spaces), but
        # every mix IS expressible with set algebra over the explicit
        # ECMA whitespace set — both targets accept the constructions,
        # and each is one quantifiable atom consuming exactly one char:
        if not jparts:
            # [\S] (possibly repeated): complement of the WS set;
            # [^\S…] with nothing else: the WS set itself
            out = _S_CLASS if negated else _NOT_S_CLASS
            return out, out, True
        jrest, prest = "".join(jparts), "".join(pparts)
        if not negated:
            # [\S x…] = ¬WS ∪ rest → alternation of the two classes
            return (f"(?:{_NOT_S_CLASS}|[{jrest}])",
                    f"(?:{_NOT_S_CLASS}|[{prest}])", True)
        # [^\S x…] = WS ∩ ¬rest → lookahead-guarded negated class
        return (f"(?:(?={_S_CLASS})[^{jrest}])",
                f"(?:(?={_S_CLASS})[^{prest}])", True)
    neg = "^" if negated else ""
    return f"[{neg}{''.join(jparts)}]", f"[{neg}{''.join(pparts)}]", True


_GROUP_NAME = _re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*\Z")
_JAVA_NAME = _re.compile(r"[A-Za-z][A-Za-z0-9]*\Z")
_PY_NAME = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


class _Frame:
    """Per-disjunction nullability/position-dependence bookkeeping (one
    frame per group or lookaround body, plus the top level). Feeds the
    ECMA/Java empty-iteration divergence check in :meth:`_quantifier`."""

    __slots__ = ("consuming", "nullable_alt", "has_assertion",
                 "last_contrib", "last_group", "definite", "last_defset",
                 "had_alt")

    def __init__(self) -> None:
        self.consuming = 0            # consuming atoms in current alternative
        self.nullable_alt = False     # some finished alternative was nullable
        self.has_assertion = False    # ^ $ \b \B backref/lookaround inside
        self.last_contrib = 0         # consumption contributed by last atom
        self.last_group: tuple[bool, bool] | None = None
        # last_group = (nullable, has_assertion) when the last atom was a
        # group (or backref, conservatively); None for plain atoms
        self.definite: set[int] = set()
        # capturing groups DEFINITELY matched whenever control reaches the
        # current point of the current alternative (for backref soundness)
        self.last_defset: set[int] = set()   # contributed by the last atom
        self.had_alt = False          # this disjunction contains `|`


class _Translator:
    def __init__(self, src: str) -> None:
        self.s = _Scanner(src)
        self.total_groups, self.all_names = _prescan(src)
        self.java_ok = True
        self.python_ok = True
        self.jout: list[str] = []
        self.pout: list[str] = []
        self.seen_groups = 0          # capturing groups opened so far
        self.seen_names: set[str] = set()
        self.prev = "none"            # none | atom | assertion | quantifier
                                      # | lookahead
        self.lookahead_mark: tuple[int, int] | None = None
        self.frames: list[_Frame] = [_Frame()]
        self.name_to_idx: dict[str, int] = {}

    def emit(self, j: str, p: str) -> None:
        self.jout.append(j)
        self.pout.append(p)

    def _atom_seen(self, *, consumes: bool = True,
                   group_info: tuple[bool, bool] | None = None) -> None:
        f = self.frames[-1]
        f.last_contrib = 1 if consumes else 0
        f.consuming += f.last_contrib
        f.last_group = group_info
        f.last_defset = set()

    def _assertion_seen(self) -> None:
        self.frames[-1].has_assertion = True

    def _backref_check(self, idx: int) -> None:
        """Backreference to a group that may be UNSET at match time:
        ECMA makes an unset-group backref match empty; Java and Python
        both FAIL it (and their backtracking then explores different
        paths), so neither dialect is a sound target — flag both, the
        compiler raises UnsupportedPatternError loudly. Safe iff the
        group is in the definitely-matched set of some enclosing
        alternative prefix. (Found by the random-pattern cross-dialect
        fuzz sweep.)"""
        if not any(idx in f.definite for f in self.frames):
            self.java_ok = False
            self.python_ok = False

    # -- escapes outside classes ------------------------------------------
    def _escape_atom(self) -> None:
        s = self.s
        if s.eof():
            raise _Invalid("trailing backslash")
        e = s.take()
        if e in "bB":
            # Python+re.ASCII: \b is the ECMA ASCII word boundary. Java's
            # \b however is Unicode-aware even though its \w is ASCII (JDK
            # quirk) — spell the ASCII boundary out with lookarounds.
            # Python's \B additionally NEVER matches in an empty string
            # (CPython quirk, present through 3.11) while ECMA's does
            # (both edges are non-word chars) — so \B gets the spelled
            # lookaround form in BOTH dialects. (Found by the
            # random-pattern cross-dialect fuzz sweep.)
            w = "[A-Za-z0-9_]"
            if e == "b":
                jb = f"(?:(?<={w})(?!{w})|(?<!{w})(?={w}))"
                self.emit(jb, "\\b")
            else:
                jb = f"(?:(?<={w})(?={w})|(?<!{w})(?!{w}))"
                self.emit(jb, jb)
            self._assertion_seen()
            self.prev = "assertion"
            return
        if e in "dDwW":
            m = {"d": "[0-9]", "D": "[^0-9]",
                 "w": "[a-zA-Z0-9_]", "W": "[^a-zA-Z0-9_]"}[e]
            self.emit(m, m)
        elif e == "s":
            self.emit(_S_CLASS, _S_CLASS)
        elif e == "S":
            self.emit(_NOT_S_CLASS, _NOT_S_CLASS)
        elif e in "fnrtv":
            cp = {"f": 0x0c, "n": 0x0a, "r": 0x0d, "t": 0x09, "v": 0x0b}[e]
            self.emit(f"\\x{cp:02x}", f"\\x{cp:02x}")
        elif e == "x":
            h = s.peek() + s.peek(1)
            if len(h) == 2 and all(c in _HEX for c in h):
                s.take(); s.take()
                self.emit(f"\\x{h}", f"\\x{h}")
            else:
                self.emit(*_esc_out("x"))     # Annex B identity
        elif e == "u":
            h = "".join(s.peek(k) for k in range(4))
            if len(h) == 4 and all(c in _HEX for c in h):
                for _ in range(4):
                    s.take()
                self.emit(f"\\u{h}", f"\\u{h}")
            else:
                self.emit(*_esc_out("u"))
        elif e == "c":
            nxt = s.peek()
            if nxt.isascii() and nxt.isalpha():
                s.take()
                cp = ord(nxt) % 32
                self.emit(f"\\x{cp:02x}", f"\\x{cp:02x}")
            else:
                # Annex B `\ [lookahead = c]`: `\` is a literal atom; the
                # `c` is re-parsed as a plain character next turn (so a
                # quantifier after `\c` applies to the `c`)
                s.i -= 1
                self.emit("\\\\", "\\\\")
        elif e == "0" and s.peek() not in _DEC:
            self.emit("\\x00", "\\x00")
        elif e in _DEC:
            num, start = e, s.i
            while s.peek() in _DEC:
                num += s.take()
            if int(num) != 0 and int(num) <= self.total_groups:
                if int(num) > self.seen_groups:
                    # forward/self reference: ECMA matches empty; neither
                    # Java nor Python reproduces that reliably
                    self.java_ok = False
                    self.python_ok = False
                self.emit(f"\\{int(num)}", f"\\{int(num)}")
                if int(num) <= self.seen_groups:
                    self._backref_check(int(num))
                # backrefs can match empty (unmatched/empty-captured
                # group) and are position-dependent: conservative
                # (nullable, assertion) marking for the quantifier check
                self._atom_seen(consumes=False, group_info=(True, True))
                self._assertion_seen()
                self.prev = "atom"
                return
            else:
                s.i = start           # Annex B: octal prefix, rest literal
                if e in "01234567":
                    digits = e
                    while len(digits) < 3 and s.peek() in _OCT \
                            and int(digits + s.peek(), 8) <= 0xFF:
                        digits += s.take()
                    cp = int(digits, 8)
                    self.emit(f"\\x{cp:02x}", f"\\x{cp:02x}")
                else:
                    self.emit(*_esc_out(e))   # \8 \9 identity
        elif e == "k":
            if s.peek() == "<":
                s.take()
                name = ""
                while not s.eof() and s.peek() != ">":
                    name += s.take()
                if s.eof() or not _GROUP_NAME.match(name):
                    raise _Invalid("bad \\k<name>")
                s.take()
                if name not in self.all_names:
                    raise _Invalid(f"backreference to undeclared group {name!r}")
                if name not in self.seen_names:
                    self.java_ok = False      # forward named reference
                    self.python_ok = False
                if not _JAVA_NAME.match(name):
                    self.java_ok = False
                if not _PY_NAME.match(name):
                    self.python_ok = False
                self.emit(f"\\k<{name}>", f"(?P={name})")
                if name in self.name_to_idx:
                    self._backref_check(self.name_to_idx[name])
                self._atom_seen(consumes=False, group_info=(True, True))
                self._assertion_seen()
                self.prev = "atom"
                return
            else:
                if self.all_names:
                    raise _Invalid("\\k must name a group when named groups exist")
                self.emit(*_esc_out("k"))     # Annex B identity
        else:
            # Annex B IdentityEscape: any other character matches itself
            # (covers \q \p \A \z \Z \G \h ... — several are Java/Python
            # metacharacters with different meanings, hence the rewrite)
            self.emit(*_esc_out(e))
        self._atom_seen()
        self.prev = "atom"

    # -- groups ------------------------------------------------------------
    def _close_group(self, idx: int | None, nullable: bool,
                     has_assert: bool, prop: set[int]) -> None:
        """Record a just-closed group on the parent frame: consumption,
        position-dependence, and the set of capturing groups that are
        DEFINITELY matched whenever this group matches (the group itself
        plus its propagated children)."""
        self._atom_seen(consumes=not nullable,
                        group_info=(nullable, has_assert))
        f = self.frames[-1]
        defset = set(prop)
        if idx is not None:
            defset.add(idx)
        f.definite |= defset
        f.last_defset = defset
        if has_assert:
            f.has_assertion = True

    def _group(self) -> None:
        s = self.s
        if s.peek() != "?":
            self.seen_groups += 1
            idx = self.seen_groups
            self.emit("(", "(")
            nul, ha, prop = self._disjunction(in_group=True)
            self.emit(")", ")")
            self._close_group(idx, nul, ha, prop)
            self.prev = "atom"
            return
        s.take()                      # '?'
        c = s.peek()
        if c == ":":
            s.take()
            self.emit("(?:", "(?:")
            nul, ha, prop = self._disjunction(in_group=True)
            self.emit(")", ")")
            self._close_group(None, nul, ha, prop)
            self.prev = "atom"
        elif c in "=!":
            s.take()
            jmark, pmark = len(self.jout), len(self.pout)
            self.emit(f"(?{c}", f"(?{c}")
            self._disjunction(in_group=True)
            self.emit(")", ")")
            self._atom_seen(consumes=False)
            self._assertion_seen()
            self.lookahead_mark = (jmark, pmark)
            self.prev = "lookahead"
        elif c == "<":
            s.take()
            c2 = s.peek()
            if c2 in "=!":
                s.take()
                # lookbehind: ECMA allows variable length; Java bounded
                # only, Python fixed only. Leave the Java hot path; keep
                # the Python form and let the compile audit decide.
                self.java_ok = False
                self.emit("", f"(?<{c2}")
                self._disjunction(in_group=True)
                self.emit("", ")")
                self._atom_seen(consumes=False)
                self._assertion_seen()
                self.prev = "assertion"
            else:
                name = ""
                while not s.eof() and s.peek() != ">":
                    name += s.take()
                if s.eof() or not _GROUP_NAME.match(name):
                    raise _Invalid("bad group name")
                s.take()
                if name in self.seen_names:
                    raise _Invalid(f"duplicate group name {name!r}")
                self.seen_names.add(name)
                self.seen_groups += 1
                idx = self.seen_groups
                self.name_to_idx[name] = idx
                if not _JAVA_NAME.match(name):
                    self.java_ok = False
                if not _PY_NAME.match(name):
                    self.python_ok = False
                self.emit(f"(?<{name}>", f"(?P<{name}>")
                nul, ha, prop = self._disjunction(in_group=True)
                self.emit(")", ")")
                self._close_group(idx, nul, ha, prop)
                self.prev = "atom"
        else:
            # (?i) (?s) (?m) inline flags, (?P=..), (?>..): SYNTAX ERRORS
            # in ECMA-262 — regress rejects them, so must we
            raise _Invalid(f"invalid group (?{c}")

    # -- quantifiers --------------------------------------------------------
    def _quantifier(self, ch: str) -> None:
        s = self.s
        if ch == "{":
            # valid quantifier iff {m} {m,} {m,n}; otherwise Annex B says
            # `{` is a LITERAL — the single biggest naive-Java crash source
            save = s.i
            body = ""
            while not s.eof() and s.peek() != "}":
                body += s.take()
            ok = (not s.eof()) and _re.fullmatch(r"\d+(,\d*)?", body)
            if ok:
                s.take()              # '}'
                parts = body.split(",")
                if len(parts) == 2 and parts[1] and int(parts[0]) > int(parts[1]):
                    raise _Invalid("quantifier range out of order")
                quant = "{" + body + "}"
            else:
                s.i = save
                self.emit("\\{", "\\{")
                self._atom_seen()
                self.prev = "atom"
                return
        else:
            quant = ch
        if self.prev in ("none", "quantifier", "assertion"):
            raise _Invalid(f"nothing to repeat for {quant}")
        if self.prev == "lookahead" and self.lookahead_mark is not None:
            # Annex B quantified assertion `(?=x)*`: wrap in a group so
            # both targets accept it (Python rejects a bare quantified
            # lookahead); repeating a zero-width assertion is equivalent
            jm, pm = self.lookahead_mark
            self.jout.insert(jm, "(?:")
            self.pout.insert(pm, "(?:")
            self.emit(")", ")")
        lazy = ""
        if s.peek() == "?":
            s.take()
            lazy = "?"
        minv = {"*": 0, "+": 1, "?": 0}.get(quant)
        if minv is None:
            minv = int(quant[1:-1].split(",")[0])
        f = self.frames[-1]
        if minv == 0:
            # the atom became optional: it no longer guarantees consumption
            # or any of its groups' participation
            f.consuming -= f.last_contrib
            f.last_contrib = 0
            f.definite -= f.last_defset
            f.last_defset = set()
        if minv >= 2 and f.last_group and f.last_group[0] and f.last_group[1]:
            # ECMA/Java empty-iteration divergence: ECMA counts zero-width
            # iterations toward the quantifier MINIMUM (RepeatMatcher only
            # rejects empty iterations once min is exhausted); Java's loop
            # assumes iterations are position-independent and aborts after
            # a zero-width match, failing the quantifier when count < min.
            # Observed: Java `(\Aa?){2}b` misses "ab" (ECMA/Python match —
            # empty first iteration, consuming second). Triggers only for
            # a NULLABLE group containing a position-dependent element
            # (anchor/boundary/backref/lookaround) under min >= 2 — route
            # those to the Python/pandas path, which matches ECMA.
            # (Found by the random-pattern cross-dialect fuzz sweep.)
            self.java_ok = False
        self.emit(quant + lazy, quant + lazy)
        self.prev = "quantifier"

    # -- driver -------------------------------------------------------------
    def _disjunction(self, *, in_group: bool) -> tuple[bool, bool, set]:
        """Parse one disjunction; returns ``(nullable, has_assertion,
        definite_groups)`` for the body: can it match empty, does it
        contain a position-dependent element, and which capturing groups
        are matched on EVERY path through it (empty when it has
        alternation — a group in one arm is unset on the other)."""
        s = self.s
        self.prev = "none"
        self.frames.append(_Frame())

        def _close() -> tuple[bool, bool, set]:
            f = self.frames.pop()
            prop = set() if f.had_alt else set(f.definite)
            return (f.nullable_alt or f.consuming == 0, f.has_assertion,
                    prop)

        while not s.eof():
            ch = s.peek()
            if ch == ")":
                if in_group:
                    s.take()
                    return _close()
                raise _Invalid("unmatched )")
            s.take()
            if ch == "|":
                self.emit("|", "|")
                f = self.frames[-1]
                f.nullable_alt |= f.consuming == 0
                f.consuming, f.last_contrib, f.last_group = 0, 0, None
                f.definite = set()
                f.last_defset = set()
                f.had_alt = True
                self.prev = "none"
            elif ch == "^":
                self.emit("\\A", "\\A")      # ECMA ^: input start only
                self._assertion_seen()
                self.prev = "assertion"
            elif ch == "$":
                self.emit("\\z", "\\Z")      # ECMA $: absolute input end
                self._assertion_seen()
                self.prev = "assertion"
            elif ch == ".":
                self.emit(_DOT_CLASS, _DOT_CLASS)
                self._atom_seen()
                self.prev = "atom"
            elif ch == "\\":
                self._escape_atom()
            elif ch == "[":
                j, p, supported = _parse_class(self.s)
                if not supported:
                    self.java_ok = False
                    self.python_ok = False
                self.emit(j, p)
                self._atom_seen()
                self.prev = "atom"
            elif ch == "(":
                self._group()
            elif ch in "*+?{":
                self._quantifier(ch)
            elif ch in "]}":
                # Annex B: stray ] / } are literals (strict ECMA rejects)
                self.emit("\\" + ch, "\\" + ch)
                self._atom_seen()
                self.prev = "atom"
            else:
                self.emit(*_esc_out(ch))
                self._atom_seen()
                self.prev = "atom"
        if in_group:
            raise _Invalid("unterminated group")
        return _close()

    def run(self) -> EcmaPattern:
        src = self.s.src
        try:
            self._disjunction(in_group=False)
        except _Invalid:
            return EcmaPattern(src, False, None, None)
        java = "".join(self.jout) if self.java_ok else None
        python = "".join(self.pout) if self.python_ok else None
        if python is not None:
            try:
                _re.compile(python, PY_FLAGS)
            except _re.error:
                python = None         # e.g. variable-width lookbehind
        return EcmaPattern(src, True, java, python)


@lru_cache(maxsize=4096)
def translate(pattern: str) -> EcmaPattern:
    """Audit ``pattern`` as ECMA-262(+Annex B) and translate it for the
    Java (``rlike``) and Python (``re`` + :data:`PY_FLAGS`) engines.
    Cached: specs repeat patterns across columns and compile calls."""
    return _Translator(pattern).run()


@lru_cache(maxsize=4096)
def compile_python(pattern: str):
    """Compiled Python matcher for an ECMA pattern (pyvalidator / pandas
    fallback path). Returns None when the pattern is invalid ECMA; raises
    :class:`UnsupportedPatternError` when valid but inexpressible."""
    t = translate(pattern)
    if not t.valid:
        return None
    if t.python is None:
        raise UnsupportedPatternError(pattern)
    return _re.compile(t.python, PY_FLAGS)

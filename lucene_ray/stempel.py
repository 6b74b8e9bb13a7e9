"""Stempel — the Polish algorithmic stemmer (``analysis/stempel``).

Loads the reference's bundled Egothor trie table
(``analysis/stempel/src/resources/.../pl/stemmer_20000.tbl``) with a
from-scratch Java-DataInput parser and transcribes the lookup + patch
machinery literally:

- ``Trie(DataInput)`` (org/egothor/stemmer/Trie.java:84-92,
  Row.java:78-87): forward flag, root index, readUTF command strings,
  rows of (char → cmd/cnt/ref/skip) cells;
- ``Trie.getLastOnPath`` (Trie.java:268-289): walk the key (REVERSED
  when ``forward`` is false — StrEnum), remembering the last row
  command, descending refs; the LAST key char only consults the
  command;
- ``MultiTrie2.getLastOnPath`` (MultiTrie2.java:141-176): each
  sub-trie contributes a diff segment; ``cannotFollow`` ('-'/'D'
  cannot repeat, :185-192), ``lengthPP`` skip accounting with its
  R-counts-one / I-counts-zero fallthrough (:214-229), EOM '*'
  terminator, IndexOutOfBounds swallowed to a partial result;
- ``Diff.apply`` (Diff.java:103-147): right-to-left patch commands
  ('-' skip, 'R' replace, 'D' delete run, 'I' insert), position
  cursor decremented per command, StringIndexOutOfBounds swallowed
  leaving the partial buffer;
- ``StempelStemmer.stem`` (StempelStemmer.java:100-110): null when no
  command or empty result; ``StempelFilter`` keeps tokens shorter than
  minLength 3 or with a null stem unchanged (StempelFilter.java:40,
  :71-83); ``PolishAnalyzer`` chains lowercase → stop (bundled
  stopwords.txt) → stempel (PolishAnalyzer.java:135-142).

The trie loads once per process (module cache) — an actor-pool stage
pays the 2.2 MB parse once in ``__init__``, the per-token walk is
O(len).
"""

from __future__ import annotations

import os
import struct

_TBL = ("/root/reference/lucene/analysis/stempel/src/resources/"
        "org/apache/lucene/analysis/pl/stemmer_20000.tbl")
_STOP = ("/root/reference/lucene/analysis/stempel/src/resources/"
         "org/apache/lucene/analysis/pl/stopwords.txt")
EOM = "*"


class _In:
    """Java DataInput over bytes: big-endian, modified-UTF8 readUTF."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def read_boolean(self) -> bool:
        v = self.b[self.i]
        self.i += 1
        return v != 0

    def read_int(self) -> int:
        v = struct.unpack_from(">i", self.b, self.i)[0]
        self.i += 4
        return v

    def read_char(self) -> str:
        v = struct.unpack_from(">H", self.b, self.i)[0]
        self.i += 2
        return chr(v)

    def read_utf(self) -> str:
        n = struct.unpack_from(">H", self.b, self.i)[0]
        self.i += 2
        raw = self.b[self.i:self.i + n]
        self.i += n
        # modified UTF-8: BMP-only payloads decode as standard UTF-8
        # (NUL is 2-byte C0 80; surrogates appear as 3-byte CESU pairs)
        out = []
        j = 0
        while j < len(raw):
            c = raw[j]
            if c < 0x80:
                out.append(chr(c))
                j += 1
            elif c >> 5 == 0b110:
                out.append(chr(((c & 0x1F) << 6) | (raw[j + 1] & 0x3F)))
                j += 2
            else:
                out.append(chr(((c & 0x0F) << 12)
                               | ((raw[j + 1] & 0x3F) << 6)
                               | (raw[j + 2] & 0x3F)))
                j += 3
        return "".join(out)


class Trie:
    __slots__ = ("forward", "root", "cmds", "rows")

    def __init__(self, inp: _In):
        self.forward = inp.read_boolean()
        self.root = inp.read_int()
        self.cmds = [inp.read_utf() for _ in range(inp.read_int())]
        self.rows = []
        for _ in range(inp.read_int()):
            cells = {}
            for _ in range(inp.read_int()):
                ch = inp.read_char()
                cmd = inp.read_int()
                cnt = inp.read_int()
                ref = inp.read_int()
                skip = inp.read_int()
                cells[ch] = (cmd, cnt, ref, skip)
            self.rows.append(cells)

    def _enum(self, key: str) -> str:
        return key if self.forward else key[::-1]

    def get_last_on_path(self, key: str) -> str | None:
        """Trie.java:268-289."""
        now = self.rows[self.root]
        last = None
        e = self._enum(key)
        for i in range(len(key) - 1):
            ch = e[i]
            cell = now.get(ch)
            if cell is not None and cell[0] >= 0:
                last = self.cmds[cell[0]]
            if cell is not None and cell[2] >= 0:
                if 0 <= cell[2] < len(self.rows):
                    now = self.rows[cell[2]]
                else:
                    return last
            else:
                return last
        cell = now.get(e[len(key) - 1]) if key else None
        if cell is not None and cell[0] >= 0:
            return self.cmds[cell[0]]
        return last


class MultiTrie2:
    """MultiTrie.java:82-89 + MultiTrie2.java:141-229."""

    __slots__ = ("forward", "by", "tries")

    def __init__(self, inp: _In):
        self.forward = inp.read_boolean()
        self.by = inp.read_int()
        self.tries = [Trie(inp) for _ in range(inp.read_int())]

    def _skip(self, s: str, count: int) -> str:
        if self.forward:
            if count > len(s):
                raise IndexError
            return s[count:]
        if count > len(s):
            raise IndexError
        return s[: len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        ln = 0
        i = 0
        while i < len(cmd):
            c = cmd[i]
            i += 1
            if c in "-D":
                ln += ord(cmd[i]) - ord("a") + 1
            elif c == "R":
                ln += 1
            # 'I': nothing
            i += 1
        return ln

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        if after in "-D":
            return after == goes
        return False

    def get_last_on_path(self, key: str) -> str:
        result = []
        try:
            lastkey = key
            p: list[str] = []
            lastch = " "
            for i, t in enumerate(self.tries):
                r = t.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                lastch = r[-2]
                p.append(r)
                if p[i][0] == "-":
                    if i > 0:
                        key = self._skip(key, self._length_pp(p[i - 1]))
                    key = self._skip(key, self._length_pp(p[i]))
                result.append(r)
                if len(key) != 0:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)


def diff_apply(dest: list, diff: str) -> None:
    """Diff.java:103-147 — in-place patch over a char list."""
    if not diff:
        return
    pos = len(dest) - 1
    if pos < 0:
        return
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if not (0 <= pos < len(dest)):
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if not (0 <= pos <= o + 1 <= len(dest)):
                    raise IndexError
                del dest[pos:o + 1]
            elif cmd == "I":
                pos += 1
                if not (0 <= pos <= len(dest)):
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass


_CACHE: dict = {}


def load_table(path: str = _TBL):
    """StempelStemmer.load (StempelStemmer.java:76-90): the leading
    readUTF method string selects Trie vs MultiTrie2 ('M')."""
    if path not in _CACHE:
        with open(path, "rb") as f:
            inp = _In(f.read())
        method = inp.read_utf().upper()
        _CACHE[path] = MultiTrie2(inp) if "M" in method else Trie(inp)
    return _CACHE[path]


def stem(word: str, table=None) -> str | None:
    """StempelStemmer.stem (StempelStemmer.java:100-110)."""
    t = table if table is not None else load_table()
    cmd = t.get_last_on_path(word)
    if cmd is None:
        return None
    # NB: MultiTrie2 never returns null — an empty command string means
    # Diff.apply is a no-op and the word stems to ITSELF
    # (StempelStemmer.java:101-108)
    buf = list(word)
    diff_apply(buf, cmd)
    return "".join(buf) if buf else None


def polish_stop_set(path: str = _STOP) -> set:
    out = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            w = line.split("#")[0].split("|")[0].strip()
            if w:
                out.add(w)
    return out


def stempel_filter(tokens: list[str], table=None,
                   min_length: int = 3) -> list[str]:
    """StempelFilter (StempelFilter.java:71-83): tokens below minLength
    or with a null stem pass unchanged."""
    t = table if table is not None else load_table()
    out = []
    for tok in tokens:
        if len(tok) >= min_length:
            s = stem(tok, t)
            out.append(s if s is not None else tok)
        else:
            out.append(tok)
    return out


def polish_analyze(tokens: list[str], table=None) -> list[str]:
    """PolishAnalyzer chain after tokenize+lowercase
    (PolishAnalyzer.java:135-142): stop filter then stempel."""
    stop = _CACHE.setdefault("__stop__", polish_stop_set())
    return stempel_filter([t for t in tokens if t not in stop], table)

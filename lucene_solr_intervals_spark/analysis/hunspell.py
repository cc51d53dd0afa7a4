"""Hunspell dictionary stemming — .aff/.dic driven affix stripping.

Reference transcription:
  hunspell/Dictionary.java:296     .aff parse (FLAG UTF-8/long/num, AF
      aliases, PFX/SFX rules with strip / append[/continuation] /
      condition, condition anchored as 'cond.*' for prefixes and '.*cond'
      for suffixes, KEEPCASE/NEEDAFFIX/ONLYINCOMPOUND/CIRCUMFIX/
      COMPLEXPREFIXES/FULLSTRIP directives), .dic parse (count line,
      word/flags, escaped slashes, tab-separated morph fields, homonyms)
  hunspell/Stemmer.java:178        doStem: dictionary forms (minus
      NEEDAFFIX/ONLYINCOMPOUND pseudostems, KEEPCASE under case variants)
      + recursive affix stripping
  hunspell/Stemmer.java:296        stem(): prefix scan (every split,
      depth-indexed), suffix scan; compatible = depth 0 | crossProduct
      with the previous flag in this affix's continuation class
  hunspell/Stemmer.java:508        applyAffix: dictionary check of the
      stripped word against the affix flag (+ chained prefix flag via the
      suffix's continuation class), circumfix pairing, and the
      depth-0/1 recursion table (prefix->suffix, suffix->suffix when
      twoStageAffix, COMPLEXPREFIXES variants)
  hunspell/Stemmer.java:103        case handling: UPPER folds to title +
      lower, TITLE folds to lower, unions of doStem over the variants
  hunspell/HunspellStemFilter.java:48  all unique stems stacked at the
      original's position; original passes through when nothing stems;
      longestOnly keeps the single longest stem

Compounding (COMPOUNDRULE etc.) is out of scope, like the reference's
stemmer ("we aren't decompounding (yet)").  ICONV/OCONV conversion
tables ARE implemented (see _parse_conv below and apply at stem time).
"""

from __future__ import annotations

import re


class _Affix:
    __slots__ = ("aid", "flag", "strip", "append", "append_flags",
                 "pattern", "cross")

    def __init__(self, aid, flag, strip, append, append_flags, pattern, cross):
        self.aid = aid
        self.flag = flag
        self.strip = strip
        self.append = append
        self.append_flags = append_flags  # frozenset of continuation flags
        self.pattern = pattern            # compiled fullmatch regex or None
        self.cross = cross


def _parse_flags(text: str, mode: str, aliases: list[frozenset]) -> frozenset:
    """FlagParsingStrategy (Dictionary.java:1035): UTF-8 = one char per
    flag; long = two chars; num = comma-separated ints.  A pure-numeric
    field with AF aliases present is an alias ordinal (1-based)."""
    text = text.strip()
    if not text:
        return frozenset()
    if aliases and text.isdigit():
        return aliases[int(text) - 1]
    if mode == "num":
        return frozenset(
            chr(int(p)) for p in text.split(",") if p.strip().isdigit()
        )
    if mode == "long":
        return frozenset(text[i : i + 2] for i in range(0, len(text) - 1, 2))
    return frozenset(text)


class HunspellDictionary:
    """Parsed .aff + .dic (Dictionary.java role, dict-backed)."""

    def __init__(self, aff_text: str, dic_text: str, ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.flag_mode = "utf8"
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self.keepcase = self.needaffix = self.onlyincompound = None
        self.circumfix = None
        self.complex_prefixes = False
        self.fullstrip = False
        self.two_stage = False
        self.aliases: list[frozenset] = []
        self.iconv = None  # NormalizeCharMap input conversion
        self.oconv = None  # NormalizeCharMap output conversion
        self._parse_aff(aff_text)
        self.words: dict[str, list[frozenset]] = {}
        self._parse_dic(dic_text)

    # ------------------------------------------------------------ parsing
    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i, n, aid = 0, len(lines), 0
        while i < n:
            parts = lines[i].split()
            i += 1
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "utf8"
                )
            elif key == "AF" and len(parts) > 1 and parts[1].isdigit() and len(parts) == 2:
                count = int(parts[1])
                for _ in range(count):
                    sub = lines[i].split()
                    i += 1
                    self.aliases.append(
                        _parse_flags(sub[1] if len(sub) > 1 else "",
                                     self.flag_mode, [])
                    )
            elif key in ("KEEPCASE", "NEEDAFFIX", "PSEUDOROOT",
                         "ONLYINCOMPOUND", "CIRCUMFIX") and len(parts) > 1:
                flag = next(iter(_parse_flags(parts[1], self.flag_mode,
                                              self.aliases)))
                attr = {"KEEPCASE": "keepcase", "NEEDAFFIX": "needaffix",
                        "PSEUDOROOT": "needaffix",
                        "ONLYINCOMPOUND": "onlyincompound",
                        "CIRCUMFIX": "circumfix"}[key]
                setattr(self, attr, flag)
            elif key == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key in ("ICONV", "OCONV") and len(parts) == 2 and parts[1].isdigit():
                # longest-match conversion tables (Dictionary.parseConversions,
                # applied by cleanInput / newStem) — MappingCharFilter tables
                from .mapping import NormalizeCharMap

                table = {}
                for _ in range(int(parts[1])):
                    sub = lines[i].split()
                    i += 1
                    if len(sub) >= 3:
                        table[sub[1]] = sub[2]
                setattr(self, key.lower(), NormalizeCharMap(table))
            elif key in ("PFX", "SFX") and len(parts) >= 4 and parts[3].isdigit():
                flag_text, count = parts[1], int(parts[3])
                is_suffix = key == "SFX"
                flag = next(iter(_parse_flags(flag_text, self.flag_mode, [])))
                for _ in range(count):
                    rule = lines[i].split()
                    i += 1
                    # PFX flag strip affix [condition [morph...]]
                    strip = "" if rule[2] == "0" else rule[2]
                    affix_field = rule[3]
                    if "/" in affix_field:
                        append, _, cont = affix_field.partition("/")
                        append_flags = _parse_flags(cont, self.flag_mode,
                                                    self.aliases)
                    else:
                        append, append_flags = affix_field, frozenset()
                    if append == "0":
                        append = ""
                    if append_flags:
                        self.two_stage = True
                    condition = rule[4] if len(rule) > 4 else "."
                    if condition.startswith("[") and "]" not in condition:
                        condition += "]"
                    if condition == "." or condition == strip:
                        pattern = None  # zero condition
                    else:
                        regex = (".*" + condition) if is_suffix else (condition + ".*")
                        try:
                            pattern = re.compile(regex)
                        except re.error:
                            pattern = None
                    cross = parts[2] == "Y"
                    af = _Affix(aid, flag, strip, append, append_flags,
                                pattern, cross)
                    aid += 1
                    table = self.suffixes if is_suffix else self.prefixes
                    table.setdefault(append, []).append(af)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for line in lines[1:]:  # first line is the entry count
            line = line.strip()
            if not line:
                continue
            entry = line.split("\t")[0].strip()
            # escaped slash is a literal; the FIRST unescaped '/' splits flags
            m = re.match(r"^((?:[^/\\]|\\.)*)(?:/(\S*))?", entry)
            word = m.group(1).replace("\\/", "/")
            flags = _parse_flags(m.group(2) or "", self.flag_mode, self.aliases)
            key = word.lower() if self.ignore_case else word
            self.words.setdefault(key, []).append(flags)

    def lookup(self, word: str) -> list[frozenset] | None:
        return self.words.get(word.lower() if self.ignore_case else word)


class HunspellStemmer:
    """Stemmer.java transcription over HunspellDictionary."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    # case handling (Stemmer.java:103-160)
    def stem(self, word: str) -> list[str]:
        return [self._oconv(s) for s in self._stem_clean(word)]

    def _oconv(self, stem: str) -> str:
        if self.d.oconv is None:
            return stem
        from .mapping import mapping_filter

        return mapping_filter(stem, self.d.oconv)[0]

    def _stem_clean(self, word: str) -> list[str]:
        d = self.d
        if d.iconv is not None:
            # needsInputCleaning (Stemmer.java:92): ICONV before anything
            from .mapping import mapping_filter

            word = mapping_filter(word, d.iconv)[0]
        if d.ignore_case:
            # needsInputCleaning: case folded up front
            return self._do_stem(word.lower(), False)
        if not word or not word[0].isupper():
            return self._do_stem(word, False)
        rest_upper = [c.isupper() for c in word[1:]]
        if rest_upper and all(rest_upper):  # UPPER
            title = word[0] + word[1:].lower()
            lower = word.lower()
            return (self._do_stem(word, False)
                    + self._do_stem(title, True)
                    + self._do_stem(lower, True))
        if not any(rest_upper):  # TITLE
            return (self._do_stem(word, False)
                    + self._do_stem(word[0].lower() + word[1:], True))
        return self._do_stem(word, False)

    def unique_stems(self, word: str) -> list[str]:
        out, seen = [], set()
        for s in self.stem(word):
            k = s.lower() if self.d.ignore_case else s
            if k not in seen:
                seen.add(k)
                out.append(s)
        return out

    def _do_stem(self, word: str, case_variant: bool) -> list[str]:
        d = self.d
        stems: list[str] = []
        for flags in d.lookup(word) or ():
            if case_variant and d.keepcase is not None and d.keepcase in flags:
                continue
            if d.needaffix is not None and d.needaffix in flags:
                continue
            if d.onlyincompound is not None and d.onlyincompound in flags:
                continue
            stems.append(word)
        stems.extend(self._strip(word, -1, -1, -1, 0, True, True,
                                 False, False, case_variant))
        return stems

    # Stemmer.stem(word, previous, prevFlag, prefixFlag, depth, ...)
    def _strip(self, word, previous, prev_flag, prefix_flag, depth,
               do_prefix, do_suffix, prev_was_prefix, circumfix,
               case_variant) -> list[str]:
        d = self.d
        stems: list[str] = []
        n = len(word)
        if do_prefix and d.prefixes:
            limit = n if d.fullstrip else n - 1
            for i in range(0, limit):
                for af in d.prefixes.get(word[:i], ()):
                    if af.aid == previous:
                        continue
                    if not self._compatible(af, prev_flag, depth,
                                            prev_was_prefix=False):
                        continue
                    stripped = af.strip + word[i:]
                    if af.pattern is not None and not af.pattern.fullmatch(stripped):
                        continue
                    stems.extend(self._apply(stripped, af, -1, depth, True,
                                             circumfix, case_variant))
        if do_suffix and d.suffixes:
            limit = 0 if d.fullstrip else 1
            for i in range(n, limit - 1, -1):
                for af in d.suffixes.get(word[i:], ()):
                    if af.aid == previous:
                        continue
                    if not self._compatible(af, prev_flag, depth,
                                            prev_was_prefix=prev_was_prefix):
                        continue
                    stripped = word[:i] + af.strip
                    if af.pattern is not None and not af.pattern.fullmatch(stripped):
                        continue
                    stems.extend(self._apply(stripped, af, prefix_flag,
                                             depth, False, circumfix,
                                             case_variant))
        return stems

    def _compatible(self, af: _Affix, prev_flag, depth, prev_was_prefix) -> bool:
        d = self.d
        if depth == 0:
            if d.onlyincompound is None:
                return True
            return d.onlyincompound not in af.append_flags
        if af.cross:
            allowed = (d.onlyincompound is None
                       or d.onlyincompound not in af.append_flags)
            # two same-side affixes need the previous flag in this affix's
            # continuation class (hasCrossCheckedFlag; empty matches only
            # after a prefix)
            return allowed and (
                (not af.append_flags and prev_was_prefix)
                or prev_flag in af.append_flags
            )
        return False

    def _apply(self, stripped, af: _Affix, prefix_flag, depth, is_prefix,
               circumfix, case_variant) -> list[str]:
        d = self.d
        stems: list[str] = []
        for flags in d.lookup(stripped) or ():
            if af.flag not in flags:
                continue
            chained_prefix = d.complex_prefixes and depth == 1 and is_prefix
            if not chained_prefix and prefix_flag != -1 and prefix_flag not in flags:
                # chain the prefix through this suffix's continuation class
                if prefix_flag not in af.append_flags:
                    continue
            if d.circumfix is not None:
                suffix_circumfix = d.circumfix in af.append_flags
                if circumfix != suffix_circumfix:
                    continue
            if case_variant and d.keepcase is not None and d.keepcase in flags:
                continue
            if d.onlyincompound is not None and d.onlyincompound in flags:
                continue
            stems.append(stripped)
        if d.circumfix is not None and not circumfix and is_prefix:
            circumfix = d.circumfix in af.append_flags
        if af.cross:
            if depth == 0:
                if is_prefix:
                    stems.extend(self._strip(
                        stripped, af.aid, af.flag, af.flag, 1,
                        d.complex_prefixes and d.two_stage, True, True,
                        circumfix, case_variant))
                elif not d.complex_prefixes and d.two_stage:
                    stems.extend(self._strip(
                        stripped, af.aid, af.flag, prefix_flag, 1,
                        False, True, False, circumfix, case_variant))
            elif depth == 1:
                if is_prefix and d.complex_prefixes:
                    stems.extend(self._strip(
                        stripped, af.aid, af.flag, af.flag, 2,
                        False, True, True, circumfix, case_variant))
                elif not is_prefix and not d.complex_prefixes and d.two_stage:
                    stems.extend(self._strip(
                        stripped, af.aid, af.flag, prefix_flag, 2,
                        False, True, False, circumfix, case_variant))
        return stems


def hunspell_stem_stream(tokens, stemmer: HunspellStemmer,
                         dedup: bool = True, longest_only: bool = False,
                         keyword_set: frozenset | None = None):
    """HunspellStemFilter.java:48: replace each token by its stems, all at
    the token's position (first posInc preserved, rest 0); tokens with no
    stems — or marked as keywords — pass through unchanged."""
    for term, pos_inc, start, end in tokens:
        if keyword_set is not None and term in keyword_set:
            yield (term, pos_inc, start, end)
            continue
        stems = (stemmer.unique_stems(term) if dedup
                 else stemmer.stem(term))
        if not stems:
            yield (term, pos_inc, start, end)
            continue
        if longest_only and len(stems) > 1:
            stems = [max(stems, key=len)]
        yield (stems[0], pos_inc, start, end)
        for s in stems[1:]:
            yield (s, 0, start, end)


def register_hunspell_analyzer(
    name: str, dictionary: HunspellDictionary,
    dedup: bool = True, longest_only: bool = False, lower: bool = True,
) -> None:
    """ws + HunspellStemFilter chain on the analyzer SPI.

    Batched flat path: hunspell_stem_stream is a stateless term -> terms
    map, so whole batches stem once per UNIQUE term (analysis/termmap.py
    — the affix recursion never runs twice for the same surface form in
    a batch)."""
    from .termmap import make_term_map_analyzer, probe_stateless
    from .tokenizer import register_analyzer, register_flat_analyzer
    from .worddelimiter import _ws_offsets_raw

    stemmer = HunspellStemmer(dictionary)

    def _run(text: str, with_offsets: bool):
        if not text:
            return ([], [], 0) if not with_offsets else ([], [], [], [], 0)
        terms, positions, starts, ends = [], [], [], []
        pos = -1
        for t, pi, st, en in hunspell_stem_stream(
            _ws_offsets_raw(text), stemmer, dedup, longest_only
        ):
            pos += pi
            terms.append(t.lower() if lower else t)
            positions.append(pos)
            starts.append(st)
            ends.append(en)
        if with_offsets:
            return terms, positions, starts, ends, len(terms)
        return terms, positions, len(terms)

    scalar = lambda s: _run(s, False)  # noqa: E731
    scalar_off = lambda s: _run(s, True)  # noqa: E731
    register_flat_analyzer(
        name,
        make_term_map_analyzer(
            lambda uniq: probe_stateless(
                uniq,
                lambda toks: hunspell_stem_stream(
                    toks, stemmer, dedup, longest_only
                ),
            ),
            lower=lower,
            scalar_fns=(scalar, scalar_off),
        ),
    )
    register_analyzer(name, scalar, scalar_off)

"""Snowball stemmers: Spanish, Portuguese, Italian, Dutch.

Pure-Python implementations from the published Snowball algorithm
specifications (M.F. Porter, snowballstem.org) — the role of the
reference's SnowballFilter (lucene/analysis/common/src/java/org/apache/
lucene/analysis/snowball/SnowballFilter.java:53) inside the per-language
analyzers (es/ESAnalyzer role, it/, pt/, nl/).

Region definitions (shared by the romance stemmers):
  R1  region after the first non-vowel following a vowel
  R2  R1 rule applied again inside R1
  RV  if the 2nd letter is a consonant: after the next vowel; if the first
      two letters are vowels: after the next consonant; otherwise after the
      3rd letter; end-of-word when not found

Every stemmer is a str -> str function over a LOWERCASED token and runs as
a vocabulary-level dictionary pass on the flat tokenize path (one call per
DISTINCT term per batch — tokenizer._stem_dict), never per token.
Correctness is pinned by per-language vocabulary tables + structural
property tests (tests/test_snowball.py).
"""

from __future__ import annotations

# --------------------------------------------------------------- regions


def _r1_start(w: str, vowels: str, start: int = 0) -> int:
    n = len(w)
    i = start
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    # w[i] is the first non-vowel following a vowel
    return i + 1 if i < n else n


def _rv_start(w: str, vowels: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return i + 1 if i < n else n
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return i + 1 if i < n else n
    return 3


def _longest_suffix(w: str, suffixes) -> str | None:
    """Snowball `among` role: the longest suffix of `w` in the set wins
    (its rule then applies or the whole step fails — no backtracking)."""
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _longest_suffix_in(w: str, suffixes, limit: int) -> str | None:
    """`among` under `setlimit tomark pV`: candidates must lie ENTIRELY
    inside the region starting at `limit` — a longer suffix crossing the
    boundary cannot even match, so a shorter in-region one wins (this is
    how the reference strips 'ía' from a word whose 'aría' starts before
    RV).  Pinned by the generated-stemmer parity sweep."""
    best = None
    for s in suffixes:
        if (
            w.endswith(s)
            and len(w) - len(s) >= limit
            and (best is None or len(s) > len(best))
        ):
            best = s
    return best


# --------------------------------------------------------------- Spanish

_ES_V = "aeiouáéíóúü"
_ES_PRON = (
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos",
)
_ES_PRE_A = {"iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er", "ír": "ir"}
_ES_PRE_B = ("ando", "iendo", "ar", "er", "ir")
_ES_S1_DEL_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_S1_ADOR = (
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
    "antes", "ancia", "ancias",
)
_ES_2A = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
    "yais", "yamos",
)
_ES_2B_GU = ("en", "es", "éis", "emos")
_ES_2B = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
    "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
    "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
    "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
    "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
    "adas", "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
    "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
    "imos", "áramos", "iéramos", "iésemos", "ásemos",
)
_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")


def spanish_stem(word: str) -> str:
    """Snowball Spanish (the reference's tartarus SpanishStemmer role)."""
    w = word
    rv = _rv_start(w, _ES_V)
    r1 = _r1_start(w, _ES_V)
    r2 = _r1_start(w, _ES_V, r1)

    # step 0: attached pronoun (among inside the RV limit)
    p = _longest_suffix_in(w, _ES_PRON, rv)
    if p:
        base = w[: -len(p)]
        pre = _longest_suffix(base, tuple(_ES_PRE_A) + _ES_PRE_B + ("yendo",))
        if pre in _ES_PRE_A and len(base) - len(pre) >= rv:
            w = base[: -len(pre)] + _ES_PRE_A[pre]  # drop the acute accent
        elif pre in _ES_PRE_B and len(base) - len(pre) >= rv:
            w = base
        elif (
            pre == "yendo"
            and len(base) - 5 >= rv  # yendo in RV; the u may sit outside it
            and base.endswith("uyendo")
        ):
            w = base

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    def in_rv(suf: str) -> bool:
        return len(w) - len(suf) >= rv

    # step 1: standard suffix removal (single longest-match among)
    step1_done = False
    all_s1 = (
        _ES_S1_DEL_R2
        + _ES_S1_ADOR
        + ("logía", "logías", "ución", "uciones", "encia", "encias",
           "amente", "mente", "idad", "idades", "iva", "ivo", "ivas", "ivos")
    )
    s = _longest_suffix(w, all_s1)
    if s:
        if s in _ES_S1_DEL_R2:
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
        elif s in _ES_S1_ADOR:
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logía", "logías"):
            if in_r2(s):
                w = w[: -len(s)] + "log"
                step1_done = True
        elif s in ("ución", "uciones"):
            if in_r2(s):
                w = w[: -len(s)] + "u"
                step1_done = True
        elif s in ("encia", "encias"):
            if in_r2(s):
                w = w[: -len(s)] + "ente"
                step1_done = True
        elif s == "amente":
            if in_r1(s):
                w = w[:-6]
                step1_done = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for extra in ("os", "ic", "ad"):
                        if w.endswith(extra) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if in_r2(s):
                w = w[:-5]
                step1_done = True
                for extra in ("ante", "able", "ible"):
                    if w.endswith(extra) and len(w) - len(extra) >= r2:
                        w = w[: -len(extra)]
                        break
        elif s in ("idad", "idades"):
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
                for extra in ("abil", "ic", "iv"):
                    if w.endswith(extra) and len(w) - len(extra) >= r2:
                        w = w[: -len(extra)]
                        break
        else:  # iva ivo ivas ivos
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    # step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    step2_done = False
    if not step1_done:
        s = _longest_suffix_in(w, _ES_2A, rv)
        # the u is tested AFTER the RV limit restores (generated
        # SpanishStemmer r_y_verb_suffix: limit_backward reset before
        # eq_s_b("u")) — it need not lie in RV
        if s and w[: -len(s)].endswith("u"):
            w = w[: -len(s)]
            step2_done = True
        # step 2b: other verb suffixes (only if 2a removed nothing)
        if not step2_done:
            s = _longest_suffix_in(w, _ES_2B + _ES_2B_GU, rv)
            if s:
                w = w[: -len(s)]
                # gu tested outside the restored limit (r_verb_suffix)
                if s in _ES_2B_GU and w.endswith("gu"):
                    w = w[:-1]  # drop the u of gu

    # step 3: residual suffix
    s = _longest_suffix_in(w, ("os", "a", "o", "á", "í", "ó", "e", "é"), rv)
    if s:
        if s in ("e", "é"):
            w = w[:-1]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]  # u must be in RV; the g need not be
        else:
            w = w[: -len(s)]

    return w.translate(_ES_DEACCENT)


# ------------------------------------------------------------- Portuguese

_PT_V = "aeiouáéíóúâêô"
_PT_S1_DEL_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
    "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento",
    "amentos", "imento", "imentos", "adora", "ador", "aça~o", "adoras",
    "adores", "aço~es", "ante", "antes", "ância",
)
_PT_2 = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "arás", "aras", "erás", "eras",
    "irás", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
    "ires", "asses", "esses", "isses", "astes", "estes", "istes", "is",
    "ais", "eis", "áveis", "íeis",
    "aríeis", "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis",
    "íreis", "ireis", "ásseis", "ésseis", "ísseis",
    "ados", "idos", "ámos", "amos", "íamos", "aríamos",
    "eríamos", "iríamos", "áramos", "éramos", "íramos", "ávamos",
    "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
    "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
    "ira", "iras",
)


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese.  Nasalised vowels enter as a~/o~ internally
    (the spec's vowel-followed-by-consonant treatment) and are restored."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_start(w, _PT_V)
    r1 = _r1_start(w, _PT_V)
    r2 = _r1_start(w, _PT_V, r1)

    def in_r1(suf):
        return len(w) - len(suf) >= r1

    def in_r2(suf):
        return len(w) - len(suf) >= r2

    def in_rv(suf):
        return len(w) - len(suf) >= rv

    altered = False
    all_s1 = _PT_S1_DEL_R2 + (
        "logía", "logías", "ución", "uciones", "ência", "ências", "amente",
        "mente", "idade", "idades", "iva", "ivo", "ivas", "ivos", "ira",
        "iras",
    )
    s = _longest_suffix(w, all_s1)
    if s:
        if s in _PT_S1_DEL_R2:
            if in_r2(s):
                w = w[: -len(s)]
                altered = True
        elif s in ("logía", "logías"):
            if in_r2(s):
                w = w[: -len(s)] + "log"
                altered = True
        elif s in ("ución", "uciones"):
            if in_r2(s):
                w = w[: -len(s)] + "u"
                altered = True
        elif s in ("ência", "ências"):
            if in_r2(s):
                w = w[: -len(s)] + "ente"
                altered = True
        elif s == "amente":
            if in_r1(s):
                w = w[:-6]
                altered = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for extra in ("os", "ic", "ad"):
                        if w.endswith(extra) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if in_r2(s):
                w = w[:-5]
                altered = True
                for extra in ("ante", "avel", "ível"):
                    if w.endswith(extra) and len(w) - len(extra) >= r2:
                        w = w[: -len(extra)]
                        break
        elif s in ("idade", "idades"):
            if in_r2(s):
                w = w[: -len(s)]
                altered = True
                for extra in ("abil", "ic", "iv"):
                    if w.endswith(extra) and len(w) - len(extra) >= r2:
                        w = w[: -len(extra)]
                        break
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(s):
                w = w[: -len(s)]
                altered = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        else:  # ira iras -> ir when in RV and preceded by e
            if in_rv(s) and len(w) - len(s) >= 1 and w[-len(s) - 1] == "e":
                w = w[: -len(s)] + "ir"
                altered = True

    if not altered:
        s = _longest_suffix_in(w, _PT_2, rv)
        if s:
            w = w[: -len(s)]
            altered = True

    if altered:
        # step 3: delete i if in RV and preceded by c
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        # step 4: residual suffix
        s = _longest_suffix_in(w, ("os", "a", "i", "o", "á", "í", "ó"), rv)
        if s:
            w = w[: -len(s)]

    # step 5 (always)
    s = _longest_suffix_in(w, ("e", "é", "ê"), rv)
    if s:
        w = w[:-1]
        for pre in ("gu", "ci"):  # the u/i must be in RV; g/c need not
            if w.endswith(pre) and len(w) - 1 >= rv:
                w = w[:-1]
                break
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# --------------------------------------------------------------- Italian

_IT_V = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")
_IT_PRON = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
)
_IT_S1_DEL_R2 = (
    "anza", "anze", "ico", "ica", "ici", "ice", "iche", "ichi", "ismo",
    "ismi", "abile",
    "abili", "ibile", "ibili", "ista", "iste", "isti", "istà", "istè",
    "istì", "oso", "osa", "osi", "ose", "mente", "atrice", "atrici",
    "ante", "anti",
)
_IT_2 = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)


def _it_mark_consonant_ui(w: str) -> str:
    """Prelude marking, SEQUENTIAL like the reference (tartarus
    ItalianStemmer r_prelude): first one left-to-right pass replacing
    'qu' -> 'qU'; then a scan that, at each VOWEL position, upper-cases a
    following u/i when that u/i is itself followed by a vowel.  Earlier
    replacements are visible to later tests (a 'qU' consonant breaks an
    i-between-vowels pattern; an 'I' breaks a following 'u' pattern)."""
    chars = list(w)
    n = len(chars)
    j = 0
    while j + 1 < n:
        if chars[j] == "q" and chars[j + 1] == "u":
            chars[j + 1] = "U"
            j += 2
        else:
            j += 1
    j = 0
    while j < n:
        if chars[j] in _IT_V:
            if (
                j + 2 < n
                and chars[j + 1] in "ui"
                and chars[j + 2] in _IT_V
            ):
                chars[j + 1] = chars[j + 1].upper()
        j += 1
    return "".join(chars)


def italian_stem(word: str) -> str:
    """Snowball Italian."""
    w = word.translate(_IT_ACUTE)
    w = _it_mark_consonant_ui(w)
    rv = _rv_start(w, _IT_V)
    r1 = _r1_start(w, _IT_V)
    r2 = _r1_start(w, _IT_V, r1)

    def in_r1(suf):
        return len(w) - len(suf) >= r1

    def in_r2(suf):
        return len(w) - len(suf) >= r2

    def in_rv(suf):
        return len(w) - len(suf) >= rv

    # step 0: attached pronoun (among inside the RV limit)
    p = _longest_suffix_in(w, _IT_PRON, rv)
    if p:
        base = w[: -len(p)]
        pre = _longest_suffix(base, ("ando", "endo", "ar", "er", "ir"))
        if pre in ("ando", "endo") and len(base) - len(pre) >= rv:
            w = base
        elif pre in ("ar", "er", "ir") and len(base) - len(pre) >= rv:
            w = base + "e"

    step1_done = False
    all_s1 = _IT_S1_DEL_R2 + (
        "azione", "azioni", "atore", "atori", "logia", "logie", "uzione",
        "uzioni", "usione", "usioni", "enza", "enze", "amento", "amenti",
        "imento", "imenti", "amente", "ità", "ivo", "iva", "ivi", "ive",
    )
    s = _longest_suffix(w, all_s1)
    if s:
        if s == "amente":
            if in_r1(s):
                w = w[:-6]
                step1_done = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for extra in ("os", "ic", "abil"):
                        if w.endswith(extra) and len(w) - len(extra) >= r2:
                            w = w[: -len(extra)]
                            break
        elif s in _IT_S1_DEL_R2:
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
        elif s in ("azione", "azioni", "atore", "atori"):
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logia", "logie"):
            if in_r2(s):
                w = w[: -len(s)] + "log"
                step1_done = True
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(s):
                w = w[: -len(s)] + "u"
                step1_done = True
        elif s in ("enza", "enze"):
            if in_r2(s):
                w = w[: -len(s)] + "ente"
                step1_done = True
        elif s in ("amento", "amenti", "imento", "imenti"):
            if in_rv(s):
                w = w[: -len(s)]
                step1_done = True
        elif s == "ità":
            if in_r2(s):
                w = w[:-3]
                step1_done = True
                for extra in ("abil", "ic", "iv"):
                    if w.endswith(extra) and len(w) - len(extra) >= r2:
                        w = w[: -len(extra)]
                        break
        else:  # ivo iva ivi ive
            if in_r2(s):
                w = w[: -len(s)]
                step1_done = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]

    if not step1_done:
        s = _longest_suffix_in(w, _IT_2, rv)
        if s:
            w = w[: -len(s)]

    # step 3a: final vowel, then a preceding i, both in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh -> c/g in RV
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.lower()


# ----------------------------------------------------------------- Dutch

_NL_V = "aeiouyè"
_NL_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_mark(w: str) -> str:
    """Prelude marking, SEQUENTIAL like the reference (tartarus
    DutchStemmer r_prelude): initial y -> Y; then a left-to-right scan
    that, at each VOWEL position, upper-cases a following 'i' when that i
    is itself followed by a vowel, or a following 'y' unconditionally.
    Earlier replacements are visible later: in 'oiy' the i is marked I
    (y counts as a vowel at test time), after which the y no longer
    follows a vowel and stays lowercase."""
    chars = list(w)
    n = len(chars)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    j = 0
    while j < n:
        if chars[j] in _NL_V:
            if (
                j + 2 < n
                and chars[j + 1] == "i"
                and chars[j + 2] in _NL_V
            ):
                chars[j + 1] = "I"
            elif j + 1 < n and chars[j + 1] == "y":
                chars[j + 1] = "Y"
        j += 1
    return "".join(chars)


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Snowball Dutch."""
    w = _nl_mark(word.translate(_NL_DEACCENT))
    if len(w) < 3:
        return w.lower()
    r1 = max(_r1_start(w, _NL_V), min(3, len(w)))
    r2 = _r1_start(w, _NL_V, _r1_start(w, _NL_V))

    def in_r1(suf):
        return len(w) - len(suf) >= r1

    def in_r2(suf):
        return len(w) - len(suf) >= r2

    def del_en(ww: str) -> tuple[str, bool]:
        """1b: delete en/ene if in R1 with a valid en-ending (non-vowel,
        not gem), then undouble."""
        for suf in ("ene", "en"):
            if ww.endswith(suf) and len(ww) - len(suf) >= r1:
                base = ww[: -len(suf)]
                if base and base[-1] not in _NL_V and not base.endswith("gem"):
                    return _nl_undouble(base), True
        return ww, False

    # step 1
    s = _longest_suffix(w, ("heden", "ene", "en", "se", "s"))
    if s == "heden":
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif s in ("ene", "en"):
        w, _ = del_en(w)
    elif s in ("se", "s"):
        if len(w) - len(s) >= r1:
            base = w[: -len(s)]
            if base and base[-1] not in _NL_V and base[-1] != "j":
                w = base

    # step 2: delete final e in R1 after a non-vowel; undouble
    e_removed = False
    if (
        w.endswith("e")
        and len(w) - 1 >= r1
        and len(w) >= 2
        and w[-2] not in _NL_V
    ):
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid (not preceded by c) -> delete in R2, then the en rule
    if w.endswith("heid") and len(w) - 4 >= r2 and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        w, _ = del_en(w)

    # step 3b: d-suffixes
    s = _longest_suffix(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if s in ("end", "ing"):
        if len(w) - len(s) >= r2:
            w = w[: -len(s)]
            if (
                w.endswith("ig")
                and len(w) - 2 >= r2
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif s == "ig":
        if len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif s == "lijk":
        if len(w) - 4 >= r2:
            w = w[:-4]
            if (
                w.endswith("e")
                and len(w) - 1 >= r1
                and len(w) >= 2
                and w[-2] not in _NL_V
            ):
                w = _nl_undouble(w[:-1])
    elif s == "baar":
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif s == "bar":
        if len(w) - 3 >= r2 and e_removed:
            w = w[:-3]

    # step 4: undouble vowel — C aa|ee|oo|uu D with D a non-vowel != I
    if (
        len(w) >= 4
        and w[-1] not in _NL_V
        and w[-1] != "I"
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _NL_V
    ):
        w = w[:-2] + w[-1]

    return w.lower()


STEMMERS = {
    "es": spanish_stem,
    "pt": portuguese_stem,
    "it": italian_stem,
    "nl": dutch_stem,
}

"""Double Metaphone phonetic encoding — vendored pure-Python kernel.

Lawrence Philips' Double Metaphone algorithm (C/C++ Users Journal,
June 2000; public domain reference implementation widely ported, e.g.
the `doublemetaphone` package the reference declares as an optional
extra, mismo/text/_similarity.py:9-36).  Implemented here from the
published rule set so the engine has no optional-dependency gate; the
Spark entry point is :func:`mismo_spark.text.similarity.double_metaphone`
(an Arrow pandas UDF mapping this function over batches).

Returns (primary, secondary) codes; secondary equals primary when the
word has no alternate pronunciation path.
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def _string_at(s: str, start: int, length: int, options) -> bool:
    if start < 0:
        return False
    return s[start : start + length] in options


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def double_metaphone_str(value: str) -> tuple[str, str]:
    """Encode one string; caller handles None."""
    # keep interior spaces: phrase rules ("SAN ", "VAN ", "JOSE ")
    # and multi-word inputs ("hello world" → HLRLT) depend on them
    s = "".join(
        ch for ch in value.upper() if ch.isalpha() or ch in "ÇÑ "
    ).strip()
    s = s.replace("Ç", "S").replace("Ñ", "N")
    length = len(s)
    if length == 0:
        return ("", "")
    last = length - 1
    primary: list[str] = []
    secondary: list[str] = []

    def add(p: str, sec: str | None = None) -> None:
        primary.append(p)
        secondary.append(p if sec is None else sec)

    i = 0
    # silent leading letters
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X is pronounced Z (e.g. "Xavier") → S
    if s[:1] == "X":
        add("S")
        i = 1

    while i < length:
        c = s[i]

        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue

        if c == "B":
            add("P")
            i += 2 if _string_at(s, i + 1, 1, ("B",)) else 1
            continue

        if c == "C":
            # various germanic: e.g. "michael" ACH but not after vowel+"ACH" with E/I following
            if (
                i > 1
                and not _is_vowel(s, i - 2)
                and _string_at(s, i - 1, 3, ("ACH",))
                and (
                    s[i + 2 : i + 3] != "I"
                    and (
                        s[i + 2 : i + 3] != "E"
                        or _string_at(s, i - 2, 6, ("BACHER", "MACHER"))
                    )
                )
            ):
                add("K")
                i += 2
                continue
            # special: "caesar"
            if i == 0 and _string_at(s, i, 6, ("CAESAR",)):
                add("S")
                i += 2
                continue
            # "chianti"
            if _string_at(s, i, 4, ("CHIA",)):
                add("K")
                i += 2
                continue
            if _string_at(s, i, 2, ("CH",)):
                # "michael"
                if i > 0 and _string_at(s, i, 4, ("CHAE",)):
                    add("K", "X")
                    i += 2
                    continue
                # greek roots: "chemistry", "chorus" etc. at word start
                if (
                    i == 0
                    and (
                        _string_at(s, i + 1, 5, ("HARAC", "HARIS"))
                        or _string_at(s, i + 1, 3, ("HOR", "HYM", "HIA", "HEM"))
                    )
                    and not _string_at(s, 0, 5, ("CHORE",))
                ):
                    add("K")
                    i += 2
                    continue
                # germanic/greek 'CH' → K
                if (
                    _string_at(s, 0, 4, ("VAN ", "VON "))
                    or _string_at(s, 0, 3, ("SCH",))
                    or _string_at(s, i - 2, 6, ("ORCHES", "ARCHIT", "ORCHID"))
                    or _string_at(s, i + 2, 1, ("T", "S"))
                    or (
                        (i == 0 or _string_at(s, i - 1, 1, ("A", "O", "U", "E")))
                        and _string_at(
                            s, i + 2, 1,
                            ("L", "R", "N", "M", "B", "H", "F", "V", "W", ""),
                        )
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if _string_at(s, 0, 2, ("MC",)):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            # "czerny"
            if _string_at(s, i, 2, ("CZ",)) and not _string_at(s, i - 2, 4, ("WICZ",)):
                add("S", "X")
                i += 2
                continue
            # "focaccia"
            if _string_at(s, i + 1, 3, ("CIA",)):
                add("X")
                i += 3
                continue
            # double C, but not "McClellan"
            if _string_at(s, i, 2, ("CC",)) and not (i == 1 and s[0] == "M"):
                # "bellocchio" but not "bacchus"
                if _string_at(s, i + 2, 1, ("I", "E", "H")) and not _string_at(
                    s, i + 2, 2, ("HU",)
                ):
                    # "accident", "accede", "succeed"
                    if (i == 1 and s[i - 1] == "A") or _string_at(
                        s, i - 1, 5, ("UCCEE", "UCCES")
                    ):
                        add("KS")
                    else:  # "bacci", "bertucci"
                        add("X")
                    i += 3
                    continue
                else:  # Pierce's rule
                    add("K")
                    i += 2
                    continue
            if _string_at(s, i, 2, ("CK", "CG", "CQ")):
                add("K")
                i += 2
                continue
            if _string_at(s, i, 2, ("CI", "CE", "CY")):
                # italian vs "cius"
                if _string_at(s, i, 3, ("CIO", "CIE", "CIA")):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if _string_at(s, i + 1, 2, (" C", " Q", " G")):
                i += 3
            elif _string_at(s, i + 1, 1, ("C", "K", "Q")) and not _string_at(
                s, i + 1, 2, ("CE", "CI")
            ):
                i += 2
            else:
                i += 1
            continue

        if c == "D":
            if _string_at(s, i, 2, ("DG",)):
                if _string_at(s, i + 2, 1, ("I", "E", "Y")):  # "edge"
                    add("J")
                    i += 3
                    continue
                else:  # "edgar"
                    add("TK")
                    i += 2
                    continue
            if _string_at(s, i, 2, ("DT", "DD")):
                add("T")
                i += 2
                continue
            add("T")
            i += 1
            continue

        if c == "F":
            add("F")
            i += 2 if s[i + 1 : i + 2] == "F" else 1
            continue

        if c == "G":
            if s[i + 1 : i + 2] == "H":
                if i > 0 and not _is_vowel(s, i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if s[i + 2 : i + 3] == "I":  # "ghislane"
                        add("J")
                    else:  # "ghoulish"
                        add("K")
                    i += 2
                    continue
                # Parker's rule (with some further refinements) — "hugh"
                if (
                    _string_at(s, i - 2, 1, ("B", "H", "D"))
                    or _string_at(s, i - 3, 1, ("B", "H", "D"))
                    or _string_at(s, i - 4, 1, ("B", "H"))
                ):
                    i += 2
                    continue
                # "laugh", "cough", "rough", "tough"
                if i > 2 and s[i - 1] == "U" and _string_at(
                    s, i - 3, 1, ("C", "G", "L", "R", "T")
                ):
                    add("F")
                elif i > 0 and s[i - 1] != "I":
                    add("K")
                i += 2
                continue
            if s[i + 1 : i + 2] == "N":
                if i == 1 and _is_vowel(s, 0) and not _slavo_germanic(s):
                    add("KN", "N")
                elif not _string_at(s, i + 2, 2, ("EY",)) and s[
                    i + 1 :
                ] != "Y" and not _slavo_germanic(s):
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if _string_at(s, i + 1, 2, ("LI",)) and not _slavo_germanic(s):
                add("KL", "L")  # "tagliaro"
                i += 2
                continue
            # -ges-, -gep-, -gel- at start
            if i == 0 and (
                s[i + 1 : i + 2] == "Y"
                or _string_at(
                    s, i + 1, 2,
                    ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER"),
                )
            ):
                add("K", "J")
                i += 2
                continue
            # -ger-, -gy-
            if (
                (_string_at(s, i + 1, 2, ("ER",)) or s[i + 1 : i + 2] == "Y")
                and not _string_at(s, 0, 6, ("DANGER", "RANGER", "MANGER"))
                and not _string_at(s, i - 1, 1, ("E", "I"))
                and not _string_at(s, i - 1, 3, ("RGY", "OGY"))
            ):
                add("K", "J")
                i += 2
                continue
            # italian "biaggi"
            if _string_at(s, i + 1, 1, ("E", "I", "Y")) or _string_at(
                s, i - 1, 4, ("AGGI", "OGGI")
            ):
                # germanic
                if (
                    _string_at(s, 0, 4, ("VAN ", "VON "))
                    or _string_at(s, 0, 3, ("SCH",))
                    or _string_at(s, i + 1, 2, ("ET",))
                ):
                    add("K")
                elif _string_at(s, i + 1, 4, ("IER ",)) or s[i + 1 :] == "IER":
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if s[i + 1 : i + 2] == "G" else 1
            continue

        if c == "H":
            # keep only if first or between vowels
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                add("H")
                i += 2
            else:
                i += 1
            continue

        if c == "J":
            # obvious spanish: "jose", "san jacinto"
            if _string_at(s, i, 4, ("JOSE",)) or _string_at(s, 0, 4, ("SAN ",)):
                if (i == 0 and s[i + 4 : i + 5] in (" ", "")) or _string_at(
                    s, 0, 4, ("SAN ",)
                ):
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and not _string_at(s, i, 4, ("JOSE",)):
                add("J", "A")  # "yankelovich" / "jankelowicz"
            elif (
                _is_vowel(s, i - 1)
                and not _slavo_germanic(s)
                and (s[i + 1 : i + 2] in ("A", "O"))
            ):
                add("J", "H")
            elif i == last:
                add("J", "")
            elif not _string_at(
                s, i + 1, 1, ("L", "T", "K", "S", "N", "M", "B", "Z")
            ) and not _string_at(s, i - 1, 1, ("S", "K", "L")):
                add("J")
            i += 2 if s[i + 1 : i + 2] == "J" else 1
            continue

        if c == "K":
            add("K")
            i += 2 if s[i + 1 : i + 2] == "K" else 1
            continue

        if c == "L":
            if s[i + 1 : i + 2] == "L":
                # spanish "cabrillo", "gallegos"
                if (
                    i == length - 3
                    and _string_at(s, i - 1, 4, ("ILLO", "ILLA", "ALLE"))
                ) or (
                    (
                        _string_at(s, last - 1, 2, ("AS", "OS"))
                        or _string_at(s, last, 1, ("A", "O"))
                    )
                    and _string_at(s, i - 1, 4, ("ALLE",))
                ):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue

        if c == "M":
            add("M")
            if (
                _string_at(s, i - 1, 3, ("UMB",))
                and (i + 1 == last or _string_at(s, i + 2, 2, ("ER",)))
            ) or s[i + 1 : i + 2] == "M":
                i += 2
            else:
                i += 1
            continue

        if c == "N":
            add("N")
            i += 2 if s[i + 1 : i + 2] == "N" else 1
            continue

        if c == "P":
            if s[i + 1 : i + 2] == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if _string_at(s, i + 1, 1, ("P", "B")) else 1
            continue

        if c == "Q":
            add("K")
            i += 2 if s[i + 1 : i + 2] == "Q" else 1
            continue

        if c == "R":
            # french "rogier" — skip final silent R (secondary keeps it)
            if (
                i == last
                and not _slavo_germanic(s)
                and _string_at(s, i - 2, 2, ("IE",))
                and not _string_at(s, i - 4, 2, ("ME", "MA"))
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if s[i + 1 : i + 2] == "R" else 1
            continue

        if c == "S":
            # "island", "isle", "carlisle"
            if _string_at(s, i - 1, 3, ("ISL", "YSL")):
                i += 1
                continue
            # "sugar"
            if i == 0 and _string_at(s, i, 5, ("SUGAR",)):
                add("X", "S")
                i += 1
                continue
            if _string_at(s, i, 2, ("SH",)):
                # germanic
                if _string_at(
                    s, i + 1, 4, ("HEIM", "HOEK", "HOLM", "HOLZ")
                ):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            # italian & armenian
            if _string_at(s, i, 3, ("SIO", "SIA")) or _string_at(s, i, 4, ("SIAN",)):
                if not _slavo_germanic(s):
                    add("S", "X")
                else:
                    add("S")
                i += 3
                continue
            # german & anglicisations: initial SM/SN/SL/SW, or SZ
            if (
                i == 0 and _string_at(s, i + 1, 1, ("M", "N", "L", "W"))
            ) or _string_at(s, i + 1, 1, ("Z",)):
                add("S", "X")
                i += 2 if _string_at(s, i + 1, 1, ("Z",)) else 1
                continue
            if _string_at(s, i, 2, ("SC",)):
                # Schlesinger's rule
                if s[i + 2 : i + 3] == "H":
                    # dutch origin: "school", "schooner"
                    if _string_at(
                        s, i + 3, 2, ("OO", "ER", "EN", "UY", "ED", "EM")
                    ):
                        # "schermerhorn", "schenker"
                        if _string_at(s, i + 3, 2, ("ER", "EN")):
                            add("X", "SK")
                        else:
                            add("SK")
                        i += 3
                        continue
                    else:
                        if i == 0 and not _is_vowel(s, 3) and s[3:4] != "W":
                            add("X", "S")
                        else:
                            add("X")
                        i += 3
                        continue
                if _string_at(s, i + 2, 1, ("I", "E", "Y")):
                    add("S")
                    i += 3
                    continue
                add("SK")
                i += 3
                continue
            # french "resnais", "artois"
            if i == last and _string_at(s, i - 2, 2, ("AI", "OI")):
                add("", "S")
            else:
                add("S")
            i += 2 if _string_at(s, i + 1, 1, ("S", "Z")) else 1
            continue

        if c == "T":
            if _string_at(s, i, 4, ("TION",)):
                add("X")
                i += 3
                continue
            if _string_at(s, i, 3, ("TIA", "TCH")):
                add("X")
                i += 3
                continue
            if _string_at(s, i, 2, ("TH",)) or _string_at(s, i, 3, ("TTH",)):
                # special: "thomas", "thames", or germanic
                if (
                    _string_at(s, i + 2, 2, ("OM", "AM"))
                    or _string_at(s, 0, 4, ("VAN ", "VON "))
                    or _string_at(s, 0, 3, ("SCH",))
                ):
                    add("T")
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if _string_at(s, i + 1, 1, ("T", "D")) else 1
            continue

        if c == "V":
            add("F")
            i += 2 if s[i + 1 : i + 2] == "V" else 1
            continue

        if c == "W":
            if _string_at(s, i, 2, ("WR",)):  # can only be in middle here
                add("R")
                i += 2
                continue
            if i == 0 and (_is_vowel(s, i + 1) or _string_at(s, i, 2, ("WH",))):
                if _is_vowel(s, i + 1):  # "wasserman"
                    add("A", "F")
                else:  # "whirlpool"
                    add("A")
            if (
                (i == last and _is_vowel(s, i - 1))
                or _string_at(
                    s, i - 1, 5, ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
                )
                or _string_at(s, 0, 3, ("SCH",))
            ):
                # "arnow" — polish
                add("", "F")
                i += 1
                continue
            if _string_at(s, i, 4, ("WICZ", "WITZ")):
                add("TS", "FX")
                i += 4
                continue
            i += 1  # else skip
            continue

        if c == "X":
            # french "breaux"
            if not (
                i == last
                and (
                    _string_at(s, i - 3, 3, ("IAU", "EAU"))
                    or _string_at(s, i - 2, 2, ("AU", "OU"))
                )
            ):
                add("KS")
            i += 2 if _string_at(s, i + 1, 1, ("C", "X")) else 1
            continue

        if c == "Z":
            if s[i + 1 : i + 2] == "H":  # chinese pinyin "zhao"
                add("J")
                i += 2
                continue
            if _string_at(s, i + 1, 2, ("ZO", "ZI", "ZA")) or (
                _slavo_germanic(s) and i > 0 and s[i - 1] != "T"
            ):
                add("S", "TS")
            else:
                add("S")
            i += 2 if s[i + 1 : i + 2] == "Z" else 1
            continue

        i += 1  # unknown character

    return ("".join(primary), "".join(secondary))

"""Abbreviation lists used by tokenization and sentence splitting.

Data parity with the reference engine's lists (originally from the public
Europarl preprocessing tools, http://www.statmt.org/europarl/):
/root/reference/texoo-core/src/main/java/de/datexis/common/WordHelpers.java:39-50

The tokenizer keeps these whole (no punctuation split) and the sentence
detector rejects a break whose running segment ends with any of them
(endswith-semantics, see
/root/reference/texoo-core/src/main/java/de/datexis/preprocess/SentenceDetectorMENL.java:214-221).
"""

from __future__ import annotations

ABBREVIATIONS_EN = frozenset([
    "Adj.", "Adm.", "Adv.", "Asst.", "Bart.", "Bldg.", "Brig.", "Bros.",
    "Capt.", "Cmdr.", "Col.", "Comdr.", "Con.", "Corp.", "Cpl.", "DR.",
    "Dr.", "Drs.", "Ens.", "Gen.", "Gov.", "Hon.", "Hr.", "Hosp.", "Insp.",
    "Lt.", "MM.", "MR.", "MRS.", "MS.", "Maj.", "Messrs.", "Mlle.", "Mme.",
    "Mr.", "Mrs.", "Ms.", "Msgr.", "Op.", "Ord.", "Pfc.", "Ph.", "Prof.",
    "Pvt.", "Rep.", "Reps.", "Res.", "Rev.", "Rt.", "Sen.", "Sens.", "Sfc.",
    "Sgt.", "Sr.", "St.", "Supt.", "Surg", "v.", "vs.", "i.e.", "rev.",
    "e.g.", "No.", "Nr.", "pp.",
])

ABBREVIATIONS_DE = frozenset([
    "I.", "II.", "III.", "IV.", "V.", "VI.", "VII.", "VIII.", "IX.", "X.",
    "XI.", "XII.", "XIII.", "XIV.", "XV.", "XVI.", "XVII.", "XVIII.", "XIX.",
    "XX.", "i.", "ii.", "iii.", "iv.", "v.", "vi.", "vii.", "viii.", "ix.",
    "x.", "xi.", "xii.", "xiii.", "xiv.", "xv.", "xvi.", "xvii.", "xviii.",
    "xix.", "xx.", "Adj.", "Adm.", "Adv.", "Asst.", "Bart.", "Bldg.",
    "Brig.", "Bros.", "Capt.", "Cmdr.", "Col.", "Comdr.", "Con.", "Corp.",
    "Cpl.", "DR.", "Dr.", "Ens.", "Gen.", "Gov.", "Hon.", "Hosp.", "Insp.",
    "Lt.", "MM.", "MR.", "MRS.", "MS.", "Maj.", "Messrs.", "Mlle.", "Mme.",
    "Mr.", "Mrs.", "Ms.", "Msgr.", "Op.", "Ord.", "Pfc.", "Ph.", "Prof.",
    "Pvt.", "Rep.", "Reps.", "Res.", "Rev.", "Rt.", "Sen.", "Sens.", "Sfc.",
    "Sgt.", "Sr.", "St.", "Supt.", "Surg.", "Mio.", "Mrd.", "bzw.", "v.",
    "vs.", "usw.", "d.h.", "z.B.", "u.a.", "etc.", "MwSt.", "ggf.", "d.J.",
    "D.h.", "m.E.", "vgl.", "I.F.", "z.T.", "sogen.", "ff.", "u.E.", "g.U.",
    "g.g.A.", "c.-à-d.", "Buchst.", "u.s.w.", "sog.", "u.ä.",
    "Std.", "evtl.", "Zt.", "Chr.", "u.U.", "o.ä.", "Ltd.", "b.A.",
    "z.Zt.", "spp.", "sen.", "SA.", "k.o.", "jun.", "i.H.v.", "dgl.",
    "dergl.", "Co.", "zzt.", "usf.", "s.p.a.", "Dkr.", "bzgl.", "BSE.",
    "No.", "Nos.", "Art.", "Nr.", "pp.", "ca.", "Ca",
])

# The reference tokenizer checks the union of both lists regardless of
# document language (TokenizerMENL.java:149); so does isAcceptableBreak.
ABBREVIATIONS = ABBREVIATIONS_EN | ABBREVIATIONS_DE

# For fast endswith checks in the sentence detector: group suffixes by length.
_BY_LEN: dict[int, frozenset[str]] = {}
for _a in ABBREVIATIONS:
    _BY_LEN.setdefault(len(_a), set()).add(_a)  # type: ignore[arg-type]
_BY_LEN = {k: frozenset(v) for k, v in _BY_LEN.items()}
ABBREV_MAX_LEN = max(_BY_LEN)


def ends_with_abbreviation(segment: str) -> bool:
    """True if ``segment`` ends with any known abbreviation.

    Mirrors SentenceDetectorMENL.isAcceptableBreak's endsWith scan
    (SentenceDetectorMENL.java:216-219) in O(max suffix length).
    """
    n = len(segment)
    for length, suffixes in _BY_LEN.items():
        if length <= n and segment[n - length:] in suffixes:
            return True
    return False

"""Deterministic language identification (T6).

The reference delegates to an n-gram profile detector
(ref: texoo-core/.../preprocess/DocumentFactory.java:269-276, optimaize).
We use a deterministic function-word scorer over the languages the engine
ships models for (en/de) plus common neighbors — adequate for routing
turns to per-language processing (GenericMentionAnnotator-style dispatch,
ref: texoo-entity-recognition/.../ner/GenericMentionAnnotator.java:64-78).
Returns "" when unknown, like the reference.
"""

from __future__ import annotations

import re

_WORD = re.compile(r"[a-zà-ÿäöüß]+")

_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
           "for", "on", "are", "as", "with", "his", "they", "at", "be",
           "this", "have", "from", "or", "had", "by", "but", "not", "what",
           "were", "when", "can", "said", "there", "an", "which", "their"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "sie", "zu",
           "den", "mit", "von", "ein", "eine", "für", "auf", "des", "im",
           "dem", "sich", "auch", "als", "werden", "aus", "bei", "nach",
           "wird", "einer", "wurde", "oder", "über", "einen", "dass", "war"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
           "du", "dans", "que", "qui", "pour", "sur", "par", "avec", "au",
           "plus", "pas", "ont", "été", "sont", "aux", "ses", "mais"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "en", "un", "una",
           "del", "que", "por", "con", "para", "su", "se", "al", "como",
           "más", "fue", "son", "entre", "está"},
    "zh": set(),  # handled by script detection below
}

_CJK = re.compile(r"[一-鿿]")


def detect_language(text: str) -> str:
    """Best-scoring language by function-word hit rate; "" if unknown."""
    if not text:
        return ""
    if _CJK.search(text):
        return "zh"
    words = _WORD.findall(text.lower())
    if not words:
        return ""
    n = len(words)
    best_lang, best = "", 0.0
    for lang, stops in _STOPWORDS.items():
        if not stops:
            continue
        score = sum(1 for w in words if w in stops) / n
        if score > best:
            best, best_lang = score, lang
    # require minimal evidence, mirroring "unknown -> empty string"
    return best_lang if best >= 0.05 else ""

"""Golden fixtures ported from the reference JUnit suites.

Sources:
- texoo-core/src/test/java/de/datexis/preprocess/DocumentFactoryTest.java
- texoo-core/src/test/java/de/datexis/model/DocumentModelTest.java

Each assertion value is taken verbatim from the Java tests; these define the
per-turn text-equality contract for the Spark extraction pipeline.
"""

from texoo_spark.textops import (
    DISCARD, KEEP, document_from_tokenized_text, extract_document,
    sent_pos_detect, tokens_to_text, words_to_text,
)

DEMENTIA = ("Dementia\nSeveral specific diagnostic criteria can be used to diagnose vascular dementia, including the Diagnostic and Statistical Manual of "
            "Mental Disorders, Fourth Edition (DSM-IV) criteria, the International Classification of Diseases, Tenth Edition (ICD-10) criteria, the National "
            "Institute of Neurological Disorders and Stroke criteria, Association Internationale pour la Recherche et l'Enseignement en Neurosciences (NINDS-AIREN) "
            "criteria, the Alzheimer's Disease Diagnostic and Treatment Center criteria, and the Hachinski Ischemic Score (after Vladimir Hachinski).\nThe recommended "
            "investigations for cognitive impairment include: blood tests (for anemia, vitamin deficiency, thyrotoxicosis, infection, etc.), chest X-Ray, ECG, "
            "and neuroimaging, preferably a scan with a functional or metabolic sensitivity beyond a simple CT or CTT. When available as a diagnostic tool, single "
            "photon emission computed tomography (SPECT) and positron emission tomography (PET) neuroimaging may be used to confirm a diagnosis of multi-infarct "
            "dementia in conjunction with evaluations involving mental status examination tests. In a person already having dementia, SPECT appears to be superior in "
            "differentiating multi-infarct dementia from Alzheimer's disease, compared to the usual mental testing and medical history analysis.")

MED_TEXT = ("Aspirin has an antiplatelet effect (e.g. preventing heart attacts, strokes and blood clot formation) by stopping the binding together of platelets [1]. "
            "Aspirin is also known as acetylsalicylic acid.")

DE_TEXT = "Prof. Dr. Alexander Löser ist Professor an der Beuth Hochschule für Technik Berlin."

TAB_TEXT = "123\tabc\n\n\nxyz  789\t\n 456 "
SPC_TEXT = "123 abc\n\n\nxyz  789 \n 456"


def sent_text(doc, i):
    b, e, ts, te = doc.sentences[i]
    return tokens_to_text(doc.tokens[ts:te], b)


def sent_tokens(doc, i):
    _, _, ts, te = doc.sentences[i]
    return doc.tokens[ts:te]


# --- DocumentFactoryTest.testSentenceSplitting (java:38-49) ---

def test_sentence_splitting_discard():
    doc = extract_document(DEMENTIA, DISCARD)
    assert len(doc.sentences) == 5
    assert sent_text(doc, 0) == "Dementia"
    assert sent_tokens(doc, 1)[0].text == "Several"
    assert sent_tokens(doc, 2)[0].text == "The"
    assert sent_tokens(doc, 3)[0].text == "When"
    assert sent_tokens(doc, 4)[0].text == "In"
    assert doc.text == DEMENTIA.replace("\n", " ")


# --- DocumentFactoryTest.testNewLines (java:51-58) ---

def test_newlines_keep():
    doc = extract_document(DEMENTIA, KEEP)
    assert len(doc.sentences) == 5
    assert doc.text == DEMENTIA
    assert sent_text(doc, 0) == "Dementia\n"


# --- DocumentFactoryTest.testSentenceBoundaries (java:60-67) ---

def test_sentence_boundaries_ellipses():
    text = "Human rights in Tanzania.\nThe issue of human rights in Tanzania, a nation with a 2012 population of 44,928,923, is hard. In its 2013 Freedom in the World report, Freedom House declared the country \"Partly Free\".\nHuman rights concerns.\nThe United Nations Human Rights Council in October 2011 at its meeting in Geneva completed a Universal Periodic Review (UPR) of the human rights situation in Tanzania. At this UPR, the United Nations Country Team (UNCT) and several countries addressed various problems in Tanzania.\nGender equality.\nNational reviews and assessments of equality between men and women... have identified a range of challenges..., which continue to prevail. These include the persistent and increasing burden of poverty on women; inequalities in arrangements for productive activities and in access to resources; inequalities in the sharing of power and decision-making; lack of respect for and inadequate promotion and protection of the human rights of women; and inequalities in managing natural resources and safeguarding the environment.... Particular attention should be drawn to the widespread marginalization of the girl child in different spheres of life, including education, and the total exclusion caused for many by early and forced marriage.... Gender-based violence is prevalent."
    doc = extract_document(text, DISCARD)
    assert len(doc.sentences) == 9  # "...." are not sentence boundaries
    assert doc.text == text.replace("\n", " ")


# --- DocumentFactoryTest.testSentenceCreation (java:69-83) ---

def test_sentence_creation_whitespace_preserved():
    text1 = "Nearing the coast of Mexico, the depression attained its peak intensity with winds of 35 mph (55 km/h) and a minimum pressure of 1,007 mbar (29.7 inHg)."
    doc1 = extract_document(text1, DISCARD)
    assert doc1.text == text1
    assert len(doc1.tokens) == 33
    text2 = "The National Hurricane Center issued the final advisory on July 7,[16] although the circulation persisted until July 9 southwest of Texas.[32]"
    doc2 = extract_document(text2, DISCARD)
    assert doc2.text == text2
    assert len(doc2.tokens) == 29


# --- DocumentFactoryTest.testTokenizedSentenceCreation (java:85-105) ---

def test_tokenized_sentence_creation():
    tokens1 = "Nearing the coast of Mexico , the depression attained its peak intensity with winds of 35 mph ( 55 km/h ) and a minimum pressure of 1,007 mbar ( 29.7 inHg ) ."
    text1 = "Nearing the coast of Mexico, the depression attained its peak intensity with winds of 35 mph (55 km/h) and a minimum pressure of 1,007 mbar (29.7 inHg)."
    doc1 = document_from_tokenized_text(tokens1)
    assert len(doc1.tokens) == 33
    assert " ".join(t.text for t in doc1.tokens) == tokens1
    assert doc1.text == text1
    tokens2 = "The National Hurricane Center issued the final advisory on July 7 , [16] although the circulation persisted until July 9 southwest of Texas . [32]"
    text2 = "The National Hurricane Center issued the final advisory on July 7, [16] although the circulation persisted until July 9 southwest of Texas. [32]"
    doc2 = document_from_tokenized_text(tokens2)
    assert len(doc2.tokens) == 25
    assert " ".join(t.text for t in doc2.tokens) == tokens2
    assert doc2.text == text2


# --- DocumentFactoryTest.testEscapedChars (java:107-112) ---

def test_escaped_chars_nbsp():
    text = "Anah.\nAnah or Ana (, \"ʾĀna\"), formerly also known as Anna, is an Iraqi town on the Euphrates river, approximately midway between the Gulf of Alexandretta and the Persian Gulf. Anah lies from west to east on the right bank along a bend of the river just before it turns south towards Hit.\nName.\nThe town is called Ha-na-at in a Babylonian letter around 2200 , A-na-at by the scribes of Tukulti-Ninurta  , and An-at by the scribes of Assur-nasir-pal II in 879 . The name has been connected with the widely worshipped war goddess Anat. It was known as \"Anathō\" () to Isidore Charax and ' to Ammianus Marcellinus; early Arabic writers described it variously as \"ʾĀna\" or (as if plural) \"ʾĀnāt\".\nAncient.\nDespite maintaining its name across 42 centuries, the exact location of the settlement seems to have moved from time to time. Sources across most of its early history, however, place Anah on an island in the Euphrates.\nIts early history under the Babylonians is uncertain. A 3rd-millennium  letter mentions six \"men of Hanat\" are mentioned in a description of disturbances in the Residency of Suhi, which would have included the district of Anah. It is probably not the place mentioned by Amenhotep I in the 16th century  or in the speech of Sennacherib's messengers to Hezekiah, but probably was the site \"in the middle of the Euphrates\" opposite which Assur-nasir-pal II halted during his 879  campaign."
    doc = extract_document(text, DISCARD)
    assert doc.text == text.replace("\n", " ").replace(" ", " ")


# --- DocumentFactoryTest.testDoubleNewlines (java:114-120) ---

def test_double_newlines():
    text = "sentence.\n\nEEG:\nEEG Lorem ipsum dolor"
    doc = extract_document(text, KEEP)
    assert doc.text == text
    assert sent_text(doc, 0) == "sentence.\n\n"


# --- DocumentFactoryTest.testEnumerationSplitter (java:122-127) ---

def test_enumeration_splitter():
    text = "They describe the process in three stages:\n1. Adaptive stage."
    doc = extract_document(text, KEEP)
    assert len(doc.sentences) == 2


# --- DocumentModelTest.testCreateDocument (java:47-65) ---

def test_create_document_from_tokenized():
    doc = document_from_tokenized_text(
        "Zairean Prime Minister Kengo wa Dondo said at the end of a visit .")
    assert len(doc.sentences) == 1
    assert len(doc.tokens) == 14
    t0, t1 = doc.tokens[0], doc.tokens[1]
    assert (t0.begin, t0.end) == (0, 7)
    assert (t1.begin, t1.end) == (8, 13)
    assert doc.sentences[0].begin == 0
    assert doc.sentences[0].end == 65
    assert doc.tokens[-1].end == 65


# --- DocumentModelTest.testTokenization (java:67-94) ---

def test_tab_text_keep():
    doc = extract_document(TAB_TEXT, KEEP)
    assert len(doc.sentences) == 3
    assert len(doc.tokens) == 9  # newlines count as tokens
    s0 = sent_tokens(doc, 0)
    assert (s0[0].text, s0[0].begin, s0[0].end) == ("123", 0, 3)
    assert (s0[1].text, s0[1].begin, s0[1].end) == ("abc", 4, 7)
    assert (s0[2].text, s0[2].begin, s0[2].end) == ("\n", 7, 8)
    s1 = sent_tokens(doc, 1)
    assert (s1[0].text, s1[0].begin, s1[0].end) == ("xyz", 10, 13)
    assert (s1[1].text, s1[1].begin, s1[1].end) == ("789", 15, 18)
    s2 = sent_tokens(doc, 2)
    assert (s2[0].text, s2[0].begin, s2[0].end) == ("456", 21, 24)
    assert doc.tokens[-1].end == len(SPC_TEXT)
    assert doc.text == SPC_TEXT


# --- DocumentModelTest.testPreprocessor (java:96-124) ---

def test_med_text():
    doc = extract_document(MED_TEXT, DISCARD)
    assert len(doc.sentences) == 2
    assert len(doc.tokens) == 36
    assert doc.tokens[-1].end == 198
    assert doc.text == MED_TEXT
    s0 = sent_tokens(doc, 0)
    assert s0[5].text == "("
    assert s0[6].text == "e.g."
    assert s0[25].text == "1"
    s1 = sent_tokens(doc, 1)
    assert (s1[0].begin, s1[0].end) == (152, 159)


def test_de_text():
    doc = extract_document(DE_TEXT, DISCARD)
    assert len(doc.sentences) == 1
    assert len(doc.tokens) == 14
    assert doc.tokens[-1].end == 83
    assert doc.text == DE_TEXT
    s0 = sent_tokens(doc, 0)
    assert s0[1].text == "Dr."
    assert s0[3].text == "Löser"


# --- DocumentModelTest.testTokenizedText (java:374-389) ---

def test_tokenized_text_roundtrip():
    original = "In March 2009 mayor Sue Jones-Davies, who had played the role of Judith Iscariot in the film Monty Python's Life of Brian (1979), organised a charity screening of the film."
    tokenized = "In March 2009 mayor Sue Jones-Davies , who had played the role of Judith Iscariot in the film Monty Python 's Life of Brian ( 1979 ) , organised a charity screening of the film ."
    doc_orig = extract_document(original, DISCARD)
    doc_tok = document_from_tokenized_text(tokenized)
    assert doc_orig.text == doc_tok.text
    assert len(doc_orig.tokens) == len(doc_tok.tokens)
    assert len(doc_orig.sentences) == len(doc_tok.sentences)


# --- WordHelpers.wordsToText rule-based join ---

def test_words_to_text():
    words = ["Nearing", "the", "coast", "of", "Mexico", ",", "the", "end", "."]
    assert words_to_text(words) == "Nearing the coast of Mexico, the end."


def test_sent_pos_detect_empty_and_ws():
    assert sent_pos_detect("") == []
    assert sent_pos_detect("   ") == []
    assert sent_pos_detect("hello world") == [(0, 11)]

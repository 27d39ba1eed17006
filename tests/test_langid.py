"""T6 n-gram-profile language identification: goldens (58 languages,
short texts, unknown handling) + exact Python<->DuckDB twin parity on
multilingual/adversarial strings the bundled ASCII test tables never
exercise (the driver's oracle gate only sees lowercase-ASCII documents)."""

import duckdb
import pandas as pd
import pytest

from texoo_spark.langid import (EVIDENCE_FLOOR_MILLI, FLOORS, LANGS,
                                PROFILES, detect_language, text_trigrams)

GOLDENS = [
    ("The quick brown fox jumps over the lazy dog and the cat", "en"),
    ("Der Hund ist ein Tier und die Katze ist auch ein Tier", "de"),
    ("Le chien est un animal et le chat est aussi un animal", "fr"),
    ("El perro es un animal y el gato es también un animal", "es"),
    ("Il cane è un animale e il gatto è anche un animale", "it"),
    ("O cachorro é um animal e o gato também é um animal", "pt"),
    ("De hond is een dier en de kat is ook een dier", "nl"),
    ("Hunden är ett djur och katten är också ett djur", "sv"),
    ("Pies jest zwierzęciem a kot też jest zwierzęciem", "pl"),
    ("Köpek bir hayvandır ve kedi de bir hayvandır", "tr"),
    ("tämä on yksinkertainen suomenkielinen teksti säästä", "fi"),
    ("toto je jednoduchý český text o počasí", "cs"),
    ("ez egy egyszerű magyar szöveg az időjárásról", "hu"),
    ("acesta este un text simplu în limba română despre vreme", "ro"),
    ("đây là một văn bản tiếng việt đơn giản về thời tiết", "vi"),
    ("ini adalah teks bahasa indonesia sederhana tentang cuaca", "id"),
    # Latin-script long tail (round 5) — incl. the close pairs da/no,
    # sk/cs, hr/sl, ms/id, each separated by its own profile
    ("denne tekst er skrevet på dansk om vejret og efteråret", "da"),
    ("dette er en norsk tekst om været og høsten", "no"),
    ("toto je jednoduchý slovenský text napísaný po slovensky", "sk"),
    ("ovo je jednostavan hrvatski tekst o vremenu", "hr"),
    ("to je preprosto slovensko besedilo o vremenu", "sl"),
    ("tai paprastas lietuviškas tekstas apie orą", "lt"),
    ("šis ir vienkāršs latviešu teksts par laikapstākļiem", "lv"),
    ("see on lihtne eestikeelne tekst ilmast", "et"),
    ("ini ialah teks bahasa melayu yang mudah tentang cuaca", "ms"),
    ("ito ay simpleng tekstong tagalog tungkol sa panahon", "tl"),
    ("你好世界这是中文", "zh"),
    ("これは日本語のテキストです", "ja"),
    ("안녕하세요 한국어 텍스트입니다", "ko"),
    # script-routed groups: Cyrillic ru/uk/bg, Arabic-script ar/fa
    ("Это простой русский текст о погоде и жизни в городе", "ru"),
    ("Це простий український текст про погоду і життя в місті", "uk"),
    ("Това е прост български текст за времето и живота в града", "bg"),
    # round 5: sr/be/mk split out of the ru/uk/bg Cyrillic group
    ("ово је једноставан српски текст о времену", "sr"),
    ("гэта просты беларускі тэкст пра надворе", "be"),
    ("ова е едноставен македонски текст за времето", "mk"),
    ("هذا نص عربي بسيط عن الطقس والحياة في المدينة", "ar"),
    ("این یک متن ساده فارسی درباره هوا و زندگی در شهر است", "fa"),
    # single-language script short-circuits
    ("Αυτό είναι ένα απλό ελληνικό κείμενο", "el"),
    ("यह मौसम के बारे में एक सरल हिंदी पाठ है", "hi"),
    ("שלום עולם זה טקסט בעברית", "he"),
    ("สวัสดีครับ นี่คือข้อความภาษาไทย", "th"),
    ("გამარჯობა ეს არის ქართული ტექსტი", "ka"),
    ("Բարև ձեզ սա հայերեն տեքստ է", "hy"),
    ("এটি একটি বাংলা পাঠ্য", "bn"),
    ("ਇਹ ਪੰਜਾਬੀ ਪਾਠ ਹੈ", "pa"),
    ("આ ગુજરાતી લખાણ છે", "gu"),
    ("ଏହା ଓଡ଼ିଆ ପାଠ୍ୟ", "or"),
    ("இது தமிழ் உரை", "ta"),
    ("ఇది తెలుగు వచనం", "te"),
    ("ಇದು ಕನ್ನಡ ಪಠ್ಯ", "kn"),
    ("ഇത് മലയാളം വാചകം", "ml"),
    ("මෙය සිංහල පෙළකි", "si"),
    ("ນີ້ແມ່ນຂໍ້ຄວາມພາສາລາວ", "lo"),
    ("འདི་ནི་བོད་ཡིག་ཡིན།", "bo"),
    ("ဤသည်မှာ မြန်မာစာဖြစ်သည်", "my"),
    ("នេះជាអត្ថបទខ្មែរ", "km"),
    ("ይህ የአማርኛ ጽሑፍ ነው", "am"),
    ("މިއީ ދިވެހި ލިޔުމެކެވެ", "dv"),
]

SHORT = [
    ("hello world", "en"),
    ("guten tag", "de"),
    ("bonjour", "fr"),
    ("hola amigo", "es"),
    ("ciao come stai", "it"),
    ("obrigado meu amigo", "pt"),
    ("goedemorgen", "nl"),
    ("tack så mycket", "sv"),
    ("dzień dobry", "pl"),
    ("merhaba nasılsın", "tr"),
    ("hei kiitos paljon", "fi"),
    ("dobrý den děkuji", "cs"),
    ("jó reggelt köszönöm", "hu"),
    ("bună ziua mulțumesc", "ro"),
    ("xin chào cảm ơn", "vi"),
    ("selamat pagi terima kasih", "id"),
    ("mange tak min ven", "da"),
    ("tusen takk min venn", "no"),
    ("dobrý deň ďakujem pekne", "sk"),
    ("dobro jutro hvala lijepa", "hr"),
    ("najlepša hvala prosim", "sl"),
    ("labas ačiū labai", "lt"),
    ("sveiki liels paldies", "lv"),
    ("tere suur tänu", "et"),
    ("apa khabar kawanku", "ms"),
    ("magandang umaga maraming salamat", "tl"),
    ("привет как дела", "ru"),
    ("добрий день друже", "uk"),
    ("благодаря много", "bg"),
    ("хвала лепо пријатељу", "sr"),
    ("вялікі дзякуй мой сябар", "be"),
    ("многу благодарам пријателе", "mk"),
    ("شكرا جزيلا", "ar"),
    ("خیلی ممنون دوست من", "fa"),
]

UNKNOWN = ["", "12345 67890 @@@", "xyzzy qwerty", "asdkj qpwoe zmxnc",
           "٣٤٥ ٦٧٨"]   # Arabic-Indic digits alone are not evidence


@pytest.mark.parametrize("text,lang", GOLDENS)
def test_goldens(text, lang):
    assert detect_language(text) == lang


@pytest.mark.parametrize("text,lang", SHORT)
def test_short_texts(text, lang):
    assert detect_language(text) == lang


@pytest.mark.parametrize("text", UNKNOWN)
def test_unknown(text):
    assert detect_language(text) == ""


def test_mixed_script_prefers_kana_then_hangul_then_han():
    # kana present -> ja even with Han characters (Japanese text mixes both)
    assert detect_language("日本語のテキストです") == "ja"
    assert detect_language("한국어 텍스트 中文") == "ko"
    assert detect_language("中文文本") == "zh"


def test_localized_digits_are_not_language_evidence():
    """Regression (round-4 review): routing and script short-circuits
    must trigger on LETTERS only — an English doc quoting one
    Arabic-Indic / Thai / Devanagari numeral stays English."""
    assert detect_language(
        "meeting at ٥ pm tomorrow evening everyone welcome") == "en"
    assert detect_language(
        "the price in bangkok is ๕๐ baht for the ride home"
        " and the weather is warm today my friend") == "en"
    assert detect_language(
        "he scored १०० points in the game yesterday"
        " and everyone was happy about the result") == "en"


def test_mixed_script_group_routing():
    # any Cyrillic routes to the Cyrillic group even with Latin filler;
    # Cyrillic outranks Arabic script in the fixed routing order
    assert detect_language("Русский текст with some English words") == "ru"
    assert detect_language("український текст and english") == "uk"
    assert detect_language("متن فارسی with english می گذرد زمان") == "fa"


def test_group_profiles_are_deterministic_integers():
    from texoo_spark.langid import GROUPS
    assert list(GROUPS) == ["latin", "cyr", "arab"]
    for tag, (langs, profiles, floors, _, _) in GROUPS.items():
        assert list(profiles) == langs
        for lang in langs:
            assert all(isinstance(v, int) and v < 0
                       for v in profiles[lang].values())
            assert floors[lang] <= min(profiles[lang].values())


def test_profiles_are_deterministic_integers():
    assert list(PROFILES) == LANGS
    for lang in LANGS:
        assert all(isinstance(v, int) and v < 0
                   for v in PROFILES[lang].values())
        assert isinstance(FLOORS[lang], int)
        # floor must be at or below every seen-trigram weight
        assert FLOORS[lang] <= min(PROFILES[lang].values())
    assert EVIDENCE_FLOOR_MILLI < 0


def test_trigram_extraction_caps_words():
    long_text = "word " * 1000
    assert len(text_trigrams(long_text)) == 200 * 4  # '#word#' -> 4 windows


def test_duckdb_twin_parity_multilingual():
    """The quality_scores oracle's language branch must agree with
    detect_language on text shapes the bundled tables never contain:
    diacritics, scripts, multi-space/tab runs, apostrophes, mixed case,
    digits inside words."""
    import __spark_entry__ as E
    texts = ([t for t, _ in GOLDENS] + [t for t, _ in SHORT] + UNKNOWN + [
        "L'été   dernier\tnous  étions à  Paris",       # fr, messy spacing
        "die straße über die brücke",                    # de, ß
        "o coração do verão",                            # pt diacritics
        "İstanbul'da güzel bir gün",                     # tr dotted capital
        "abc123def mixed tokens 42",                     # digits split words
        "HELLO WORLD THIS IS LOUD ENGLISH TEXT HERE",    # all caps
        "a b c d e f g h i j",                           # 1-letter words
        "Русский текст with some English words",         # cyr routing
        "mixed Кириллица and عربي in one line",          # cyr before arab
        "СЕГОДНЯ ХОРОШАЯ ПОГОДА",                        # Cyrillic caps
        "الطقس جميل اليوم ونحن ذاهبون الى الحديقة",      # ar
        "امروز هوا خوب است و ما به پارک می رویم",        # fa
        "٣٤٥ ٦٧٨",                                       # digits only
        "Αυτό είναι ελληνικό",                           # el short-circuit
        "यह हिंदी है",                                    # hi short-circuit
        "שלום עולם",                                     # he
        "สวัสดี",                                         # th
        "mixed עברית and english words",                 # he routing
        "ᏣᎳᎩ syllabary is unsupported",                  # not a known script
    ])
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    sql = E._detect_language_oracle()
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        assert got[i] == detect_language(t), (t, got[i], detect_language(t))

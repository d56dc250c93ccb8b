"""Frozen language table mirroring the reference's compile-time Lang enum.

The reference embeds 242 language codes as a dense ``#[repr(u8)]`` enum
(``/root/reference/heliport-model/src/lang.rs:28-271``); the enum *order* is
semantically load-bearing (score-vector index, argmin tie-breaking). We mirror
it as a frozen list whose index == the reference's enum discriminant.

Macrolanguage collapse map: ``lang.rs:282-301``.
CJK language set: ``lang.rs:274-276``.
Special labels (und/zxx): ``lang.rs:278-280``.
"""

from __future__ import annotations

import numpy as np

# Index == reference enum discriminant (lang.rs:28-271). Do not reorder.
LANGS: tuple[str, ...] = (
    "abk", "ace", "adz", "afr", "aii", "ame", "amh", "amr", "ara", "arl",
    "arn", "asm", "ayr", "aze", "bak", "bar", "bcl", "bel", "ben", "boa",
    "bod", "bpy", "bre", "bul", "cat", "cbu", "cdo", "ceb", "ces", "che",
    "chk", "cho", "chr", "chv", "chy", "ckb", "cmn", "cnh", "cor", "cos",
    "cym", "dan", "deu", "dik", "diq", "div", "ell", "eng", "epo", "est",
    "estvro", "eus", "ewe", "ext", "fao", "fij", "fin", "fini", "fink",
    "finl", "finm", "fino", "finp", "finr", "fins", "fint", "finx", "fon",
    "fra", "fry", "gaz", "gla", "gle", "glg", "glv", "gom", "grn", "gsw",
    "guj", "hat", "hbs", "hbsbos", "hbshrv", "hbssrp", "heb", "hin", "hmo",
    "hsb", "hun", "hus", "huu", "hye", "ibo", "ido", "iku", "ilo", "ina",
    "isl", "ita", "izh", "jpn", "kac", "kal", "kan", "kat", "kaz", "kbd",
    "kbp", "kca", "khm", "kir", "kmr", "knc", "koi", "kor", "kpv", "krc",
    "ksh", "lao", "lat", "lav", "lin", "lit", "liv", "lmo", "ltz", "lud",
    "lug", "luo", "lus", "mal", "mar", "mcd", "mcf", "mdf", "mhr", "mkd",
    "mlg", "mlt", "mns", "mon", "mri", "mrj", "msa", "msaind", "msamalay",
    "msamin", "msazsm", "mwl", "mya", "myv", "nav", "nep", "nhn", "nio",
    "nld", "nno", "nob", "nso", "nus", "oci", "olo", "ori", "oss", "pag",
    "pam", "pan", "pbt", "pes", "pfl", "pli", "pms", "pnb", "pol", "pon",
    "por", "que", "roh", "ron", "rus", "sag", "sagb", "sah", "sat", "scn",
    "sgs", "shk", "shn", "sin", "sjd", "sjk", "sju", "slk", "slv", "sma",
    "sme", "smj", "smn", "sms", "sna", "snd", "som", "sot", "spa", "sqi",
    "srd", "swa", "swe", "tam", "tat", "tca", "tel", "tet", "tgk", "tgl",
    "tha", "tir", "tso", "tuk", "tur", "twi", "tzh", "udm", "uig", "ukr",
    "undhtml", "und", "ura", "urd", "uzn", "vie", "vls", "vol", "vot",
    "war", "wln", "xmf", "yid", "yrk", "yor", "zul", "zxx",
)

N_LANGS = len(LANGS)
assert N_LANGS == 242

LANG_INDEX: dict[str, int] = {l: i for i, l in enumerate(LANGS)}

UND = LANG_INDEX["und"]
ZXX = LANG_INDEX["zxx"]

# Macrolanguage collapse (lang.rs:282-301): variant -> macrolang.
_COLLAPSE_STR: dict[str, str] = {
    "fini": "fin", "fink": "fin", "finl": "fin", "finm": "fin",
    "fino": "fin", "finp": "fin", "finr": "fin", "fins": "fin",
    "fint": "fin", "finx": "fin",
    "hbsbos": "hbs", "hbshrv": "hbs", "hbssrp": "hbs",
    "estvro": "est",
    "msaind": "msa", "msamalay": "msa", "msamin": "msa", "msazsm": "msa",
    "sagb": "sag",
    "undhtml": "und",
}

# COLLAPSE[i] = index of the collapsed (macro) language for enum index i.
COLLAPSE: np.ndarray = np.arange(N_LANGS, dtype=np.uint8)
for _v, _m in _COLLAPSE_STR.items():
    COLLAPSE[LANG_INDEX[_v]] = LANG_INDEX[_m]
COLLAPSE.setflags(write=False)

# CJK languages (lang.rs:274-276): jpn, kor, cmn, cdo.
CJK_LANG_MASK: np.ndarray = np.zeros(N_LANGS, dtype=bool)
for _l in ("jpn", "kor", "cmn", "cdo"):
    CJK_LANG_MASK[LANG_INDEX[_l]] = True
CJK_LANG_MASK.setflags(write=False)

# Special labels (lang.rs:278-280).
SPECIAL_MASK: np.ndarray = np.zeros(N_LANGS, dtype=bool)
SPECIAL_MASK[UND] = True
SPECIAL_MASK[ZXX] = True
SPECIAL_MASK.setflags(write=False)

LANGS_ARR: np.ndarray = np.array(LANGS, dtype=object)
LANGS_ARR.setflags(write=False)


def collapse(lang: str) -> str:
    """Collapse a variant code to its macrolanguage (lang.rs:282-301)."""
    return _COLLAPSE_STR.get(lang, lang)

"""Family-name detection (reference: lib/pdf/extract/names.rb:21-49).

The reference backs this with ``data/familynames.db`` (SQLite), which is
absent from the snapshot (/root/reference/.MISSING_LARGE_BLOBS:1).  We
substitute a deterministic synthetic family-name list (FIXTURES.md §4);
golden fixtures are generated against the same list, so per-turn text
equality is self-consistent.

Two reference quirks are replicated deliberately:

1. ``names.rb:28`` — ``if not @@stop_words.include? word && word.length > 1``
   parses as ``include?(word && (word.length > 1))`` i.e. membership of a
   *boolean* in a string list: always false, so the guard always passes.
   Stopword/length filtering is therefore a no-op; every word is scored.
2. Name normalization is ``downcase -> capitalize`` plus capitalizing
   after hyphens (names.rb:30-32).

Weights: ambiguous 0.0, unambiguous 1.0 (names.rb:10-11).  name_frequency
is sum(weights) / word_count, 0 when the sum is 0 (names.rb:44-48).
"""

from __future__ import annotations

# Deterministic synthetic surname list: cartesian product of fixed
# syllables, no RNG, stable across runs and machines.  ~500 names;
# every 7th (by index) is flagged ambiguous (weight 0.0).
_PREFIXES = [
    "Abel", "Bar", "Cald", "Dun", "Eger", "Fair", "Gold", "Hart",
    "Ingle", "Jar", "Kemp", "Lind", "Mor", "Nor", "Ostr", "Pem",
    "Quin", "Ross", "Strat", "Thorn", "Under", "Van", "Whit", "Yard",
    "Zeller",
]
_SUFFIXES = [
    "berg", "by", "dale", "field", "gate", "ham", "land", "ley",
    "man", "mont", "sen", "shaw", "son", "stead", "ton", "well",
    "wick", "wood", "worth", "low",
]


def _build() -> tuple[dict[str, float], list[tuple[str, int]]]:
    weights: dict[str, float] = {}
    rows: list[tuple[str, int]] = []
    i = 0
    for p in _PREFIXES:
        for s in _SUFFIXES:
            name = (p + s).capitalize()
            ambiguous = 1 if i % 7 == 3 else 0
            weights[name] = 0.0 if ambiguous else 1.0
            rows.append((name, ambiguous))
            i += 1
    return weights, rows


_NAME_WEIGHTS, NAME_ROWS = _build()

# stopwords.txt verbatim set is shipped for the *operators* that use it
# (language-id / quality scoring); per quirk (1) above it is NOT applied
# inside name_frequency.
STOPWORDS = (
    "a,able,about,across,after,all,almost,also,am,among,an,and,any,are,as,"
    "at,be,because,been,but,by,can,cannot,could,dear,did,do,does,either,"
    "else,ever,every,for,from,get,got,had,has,have,he,her,hers,him,his,how,"
    "however,i,if,in,into,is,it,its,just,least,let,like,likely,may,me,"
    "might,most,must,my,neither,no,nor,not,of,off,often,on,only,or,other,"
    "our,own,rather,say,says,she,should,since,so,some,than,that,the,their,"
    "them,then,there,these,they,this,tis,to,too,twas,us,wants,was,we,were,"
    "what,when,where,which,while,who,whom,why,will,with,would,yet,you,your,"
    "association,company,org,organisation,president,vice,nobel,prize,"
    "medicine,biology,physics,chemistry,laboratories,labs"
).split(",")


def _normalize(word: str) -> str:
    """downcase -> capitalize -> capitalize after each hyphen."""
    w = word.lower().capitalize()
    if "-" in w:
        parts = w.split("-")
        w = "-".join([parts[0]] + [p[:1].upper() + p[1:] for p in parts[1:]])
    return w


from functools import lru_cache


@lru_cache(maxsize=1 << 17)
def _weight(word: str) -> float:
    return _NAME_WEIGHTS.get(_normalize(word), 0.0)


def name_frequency(content: str) -> float:
    words = content.split()
    if not words:
        return 0.0
    total = 0.0
    for word in words:
        total += _weight(word)
    if total == 0:
        return 0.0
    return total / float(len(words))

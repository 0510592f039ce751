"""In-engine championship-vacancy scraper (SURVEY §2.1 S5, parse semantics).

The reference extracts title vacancy/strip/retirement notes from the
championship-history wikitables of a Wikipedia page with a 494-line
driver-side script (/root/reference/scripts/vacancy_and_strips_scraper/
extract_vacancies.py:30-174 parse, :186-305 classification) and ships the
result as a notes CSV. This module is the capability re-expressed
Spark-first, in two stages with an explicit seam:

1. **Parse** (imperative, per-file — the legitimate place for procedural
   code): ``spark.read.format("wikinotes")`` emits one row per *note row*
   found in any ``class="wikitable"`` table — a row whose cell spans
   multiple columns (reference ``_is_note_row``, :332-339) — carrying its
   context: the weight class (nearest h2/h3/h4 heading or table caption,
   :63-70/:100-106), the champion named most recently above it (champion
   column resolved from header keywords, :345-353), and every fighter
   name seen in the table so far.

2. **Classify** (declarative): :func:`classify_vacancy_notes` turns raw
   notes into the reference CSV's exact contract
   ``(date, fighter, weight_category, reason, statement)`` with Column
   expressions — keyword rlike gate, first-match date regexes, reason
   CASE ladder, fighters-array containment — plus ONE Arrow-batched
   pandas UDF for the capitalized-word fallback heuristic (:223-305),
   which is genuinely procedural. Notes tables are KB-sized dimension
   feeds, so the UDF is off every hot path.

Parity notes (verified against the reference script run on the same
fixture HTML): the reference's unique-last-name fallback (:208-218)
searches for a literal ``\\b`` (escaped-backslash artifact in an rf-string)
and therefore never matches — faithfully reproduced here by omission.
"""

from __future__ import annotations

import glob as _glob
import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# reference extract_vacancies.py:12-27
VACANCY_KEYWORDS = [
    "retire",
    "retired",
    "retirement",
    "vacat",
    "vacant",
    "injur",
    "stripp",
    "suspend",
    "suspension",
]
# insertion order matters: first matching reason wins (reference :192-198)
REASON_KEYWORDS = {
    "retirement": ["retire", "retired", "retirement"],
    "strip": ["stripp"],
    "vacancy": ["vacat", "vacant"],
}
_CHAMPION_HEADER_WORDS = ("champion", "name", "fighter")

_MONTHS = (
    "January February March April May June July August September "
    "October November December"
).split()


def _squash(text: str) -> str:
    """Drop [footnote] markers, collapse whitespace (reference :176-179)."""
    return re.sub(r"\s+", " ", re.sub(r"\[[^\]]*\]", "", text)).strip()


def _candidate_name(text: str) -> str:
    """A cell is a fighter name iff it has no digits, isn't a bout/vacancy
    marker, is 3-60 chars, and is multi-word or hyphenated
    (reference ``_candidate_name_from_text``, :309-321)."""
    if not text or any(ch.isdigit() for ch in text):
        return ""
    low = text.lower()
    if "vacant" in low or "interim" in low or "def." in low or " vs " in low:
        return ""
    if not (3 <= len(text) <= 60) or (" " not in text and "-" not in text):
        return ""
    return text


class _NoteParser(HTMLParser):
    """Stream wikitable rows, keeping the running context the reference
    keeps (:30-173): heading/caption → weight class, champion column from
    header rows, last champion row above each note row, per-table fighter
    roster."""

    def __init__(self) -> None:
        super().__init__()
        self.notes: list[tuple[str, str, str, list[str]]] = []
        self._tables: list[bool] = []  # is-wikitable flags, nesting order
        self._rosters: list[list[str]] = []  # fighters per open wikitable
        self._buf: list[str] | None = None  # active text sink
        self._sink = ""  # which element the sink belongs to
        self._heading = ""
        self._weight_class = ""
        self._last_fighter = ""
        self._champion_col: int | None = None
        self._cells: list[tuple[str, int, bool]] | None = None
        self._colspan = 1
        self._is_th = False

    # -- tag plumbing -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in ("h2", "h3", "h4"):
            self._buf, self._sink = [], "heading"
        elif tag == "table":
            classes = (dict(attrs).get("class") or "").split()
            wikitable = "wikitable" in classes
            self._tables.append(wikitable)
            if wikitable:
                self._rosters.append([])
                if self._heading:
                    self._weight_class = self._heading
        elif tag == "caption" and any(self._tables):
            self._buf, self._sink = [], "caption"
        elif tag == "tr" and any(self._tables):
            self._cells = []
        elif tag in ("td", "th") and self._cells is not None:
            self._buf, self._sink = [], "cell"
            self._is_th = tag == "th"
            try:
                self._colspan = int(dict(attrs).get("colspan", 1))
            except (TypeError, ValueError):
                self._colspan = 1

    def handle_data(self, data):
        if self._buf is not None:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag in ("h2", "h3", "h4") and self._sink == "heading":
            text = _squash("".join(self._buf or []))
            if text:
                self._heading = text
            self._buf = None
        elif tag == "caption" and self._sink == "caption":
            text = _squash("".join(self._buf or []))
            if text:
                self._weight_class = text
            self._buf = None
        elif tag in ("td", "th") and self._sink == "cell" and self._cells is not None:
            self._cells.append(
                (_squash("".join(self._buf or [])), self._colspan, self._is_th)
            )
            self._buf = None
        elif tag == "tr" and self._cells is not None:
            self._row(self._cells)
            self._cells = None
        elif tag == "table" and self._tables:
            if self._tables.pop() and self._rosters:
                self._rosters.pop()
            if not self._tables:
                self._weight_class = ""
                self._last_fighter = ""
                self._champion_col = None

    # -- row semantics (reference :140-173) --------------------------------
    def _row(self, cells: list[tuple[str, int, bool]]) -> None:
        if not cells:
            return
        spans_wide = any(cs > 1 and text for text, cs, _ in cells) or (
            len(cells) == 1 and cells[0][1] > 1
        )
        if spans_wide:  # note row
            note = cells[0][0]
            if note:
                roster = list(self._rosters[-1]) if self._rosters else []
                self.notes.append(
                    (note, self._weight_class, self._last_fighter, roster)
                )
            return
        if any(is_th for _, _, is_th in cells):  # header row
            col = 0
            for text, cs, is_th in cells:
                if is_th and text and any(
                    w in text.lower() for w in _CHAMPION_HEADER_WORDS
                ):
                    self._champion_col = col
                    return
                col += max(cs, 1)
            return
        fighter = self._fighter_in(cells)
        if fighter:
            self._last_fighter = fighter
            if self._rosters:
                self._rosters[-1].append(fighter)

    def _fighter_in(self, cells) -> str:
        if self._champion_col is not None:
            col = 0
            for text, cs, _ in cells:
                if col <= self._champion_col < col + max(cs, 1):
                    name = _candidate_name(text)
                    if name:
                        return name
                    break
                col += max(cs, 1)
        for text, _, _ in cells:
            name = _candidate_name(text)
            if name:
                return name
        return ""


def parse_vacancy_notes(html: str) -> list[tuple[int, str, str, str, list[str]]]:
    """(pos, note, weight_class, last_fighter, fighters) per note row."""
    p = _NoteParser()
    p.feed(html)
    return [(i, *entry) for i, entry in enumerate(p.notes)]


_NOTES_SCHEMA = StructType(
    [
        StructField("pos", IntegerType()),
        StructField("note", StringType()),
        StructField("weight_class", StringType()),
        StructField("last_fighter", StringType()),
        StructField("fighters", ArrayType(StringType())),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WikiNotesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._options = options

    def partitions(self):  # one parse task per file
        return [
            _FilePartition(p)
            for p in sorted(_glob.glob(self._options["path"]))
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            yield from parse_vacancy_notes(f.read())


class WikiNotesDataSource(DataSource):
    """``spark.read.format("wikinotes").option("path", glob)`` — raw note
    rows with context; classification stays declarative downstream."""

    @classmethod
    def name(cls) -> str:
        return "wikinotes"

    def schema(self) -> StructType:
        return _NOTES_SCHEMA

    def reader(self, schema: StructType) -> WikiNotesReader:
        return WikiNotesReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(WikiNotesDataSource)


# ---------------------------------------------------------------------------
# classification — Column expressions over the raw notes
# ---------------------------------------------------------------------------

_CLEAN_HEAD = r"^[^A-Za-z]+"
_CLEAN_TAIL = r"[^A-Za-z'\\-]+$"
_HEUR_STOP = frozenset(
    "the a an on in at after before when while during following".split()
)
_HEUR_MONTHS = frozenset(m.lower() for m in _MONTHS)
_HEUR_PARTICLES = frozenset(
    "da de del della der den di do dos du la le van von st st.".split()
)


def _clean_word(raw: str) -> str:
    return re.sub(f"{_CLEAN_HEAD}|{_CLEAN_TAIL}", "", raw)


def infer_fighter_from_statement(note: str) -> str:
    """Capitalized-word scan over the note's first 8 words (reference
    ``_infer_fighter_from_statement``, :223-305): skip stopwords/months,
    seed on the first capitalized word (or particle + capitalized word),
    then extend through particles and capitalized words, max 4 parts."""
    if not note:
        return ""
    words = note.split()
    scan = min(8, len(words))
    name: list[str] = []
    seed_at = 0
    for i in range(scan):
        word = _clean_word(words[i])
        if not word:
            continue
        low = word.lower()
        if low in _HEUR_STOP or low in _HEUR_MONTHS:
            continue
        if word[0].isupper():
            name = [word]
        elif low in _HEUR_PARTICLES and i + 1 < scan:
            nxt = _clean_word(words[i + 1])
            if nxt and nxt[0].isupper():
                name = [word, nxt]
        if name:
            seed_at = i
            break
    if not name:
        return ""
    for raw in words[seed_at + len(name) : scan]:
        word = _clean_word(raw)
        if not word:
            break
        if word.lower() in _HEUR_PARTICLES:
            name.append(word)
            continue
        if not word[0].isupper():
            break
        name.append(word)
        if len(name) >= 4:
            break
    return " ".join(name)


def _date_expr(note: F.Column) -> F.Column:
    month = "|".join(_MONTHS)
    pats = [  # first match wins (reference ``_extract_date``, :376-399)
        rf"(({month})\s+\d{{1,2}},\s+\d{{4}})",
        rf"(\d{{1,2}}\s+({month})\s+\d{{4}})",
        rf"(({month})\s+\d{{4}})",
    ]
    return F.coalesce(
        *[F.nullif(F.regexp_extract(note, p, 1), F.lit("")) for p in pats],
        F.lit(""),
    )


def _reason_expr(note: F.Column) -> F.Column:
    low = F.lower(note)
    expr = F.lit("")
    for reason, tokens in reversed(list(REASON_KEYWORDS.items())):
        cond = F.lit(False)
        for t in tokens:
            cond = cond | low.contains(t)
        expr = F.when(cond, reason).otherwise(expr)
    return expr


def classify_vacancy_notes(notes: DataFrame) -> DataFrame:
    """Raw note rows → the reference CSV contract
    ``(date, fighter, weight_category, reason, statement)``, keyword-gated
    and first-occurrence-deduped on (note, fighter, weight_class)
    (reference ``extract_sentences``, :413-443)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def heuristic_fighter(s):  # Arrow-batched; KB-sized input
        return s.map(infer_fighter_from_statement)

    low_note = F.lower(F.col("note"))
    kw_gate = F.lit(False)
    for k in VACANCY_KEYWORDS:
        kw_gate = kw_gate | low_note.contains(k)
    containment = F.filter(
        F.col("fighters"),
        lambda f: (f != "") & F.lower(F.col("note")).contains(F.lower(f)),
    )
    first_seen = Window.partitionBy(
        "note", "last_fighter", "weight_class"
    ).orderBy("pos")
    return (
        notes.filter(kw_gate)
        .withColumn("rn", F.row_number().over(first_seen))
        .filter(F.col("rn") == 1)
        .select(
            F.col("pos"),
            _date_expr(F.col("note")).alias("date"),
            F.coalesce(
                F.nullif(F.col("last_fighter"), F.lit("")),
                F.nullif(F.element_at(containment, 1), F.lit("")),
                # unique-last-name branch omitted: dead in the reference
                # (literal '\\b' regex artifact, :208-218)
                F.nullif(heuristic_fighter(F.col("note")), F.lit("")),
                F.lit(""),
            ).alias("fighter"),
            F.col("weight_class").alias("weight_category"),
            _reason_expr(F.col("note")).alias("reason"),
            F.col("note").alias("statement"),
        )
        .orderBy("pos")
        .drop("pos")
    )


def scrape_vacancies(spark, html_glob: str) -> DataFrame:
    """End-to-end S5: HTML files → classified vacancy notes — the
    in-engine equivalent of the reference scraper's CSV output."""
    register(spark)
    notes = spark.read.format("wikinotes").option("path", html_glob).load()
    return classify_vacancy_notes(notes)

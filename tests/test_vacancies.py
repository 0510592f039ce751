"""In-engine vacancy scraper (S5 parse semantics) vs the reference script.

Expected rows below are the verbatim output of the reference extractor
(/root/reference/scripts/vacancy_and_strips_scraper/extract_vacancies.py)
run on tests/fixtures/champions_page.html — including its quirks (a
"some bout" cell passes the candidate-name filter; the 'suspended' note
gets an empty reason because suspension is a match keyword but not a
reason keyword; duplicate notes survive when their context differs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ufc_data_warehouse_spark.sources.vacancies import (
    classify_vacancy_notes,
    infer_fighter_from_statement,
    parse_vacancy_notes,
    scrape_vacancies,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "champions_page.html")

EXPECTED = [
    ("July 27, 1997", "Mark Coleman", "Heavyweight", "vacancy",
     "Coleman vacated the title after an injury on July 27, 1997."),
    ("January 1998", "Randy Couture", "Heavyweight", "strip",
     "Randy Couture was stripped of the title in January 1998 following a contract dispute."),
    ("5 March 1999", "Randy Couture", "Heavyweight", "retirement",
     "The champion retired on 5 March 1999."),
    ("", "Frank Shamrock", "Light Heavyweight Championship", "retirement",
     "After Shamrock retired, the belt was declared vacant."),
    ("September 24, 2003", "Frank Shamrock", "Light Heavyweight Championship", "",
     "On September 24, 2003, van Damme was suspended indefinitely."),
    ("August 1, 2002", "some bout", "Interim notes", "strip",
     "Due to injury, Tito Ortiz was stripped on August 1, 2002."),
    ("", "some bout", "Interim notes", "retirement",
     "After Shamrock retired, the belt was declared vacant."),
]


def test_scraper_matches_reference_output(spark):
    got = [tuple(r) for r in scrape_vacancies(spark, FIXTURE).collect()]
    assert got == EXPECTED


def test_parse_skips_non_wikitables():
    with open(FIXTURE, encoding="utf-8") as f:
        notes = parse_vacancy_notes(f.read())
    texts = [n[1] for n in notes]
    assert not any("non-wikitable" in t for t in texts)
    # the keyword gate happens in classify, so the no-keyword note is here
    assert any("Nothing notable" in t for t in texts)


def test_statement_heuristic_branches():
    # seed on first capitalized word, extend through particle, cap at 4
    assert (
        infer_fighter_from_statement("After the fight Jan van der Berg Culture quit")
        == "Jan van der Berg"
    )
    # months and stopwords are skipped, not seeds
    assert infer_fighter_from_statement("In January the champ quit") == ""
    # particle + capitalized next word seeds a two-part name
    assert infer_fighter_from_statement("van Damme was suspended").startswith(
        "van Damme"
    )


def test_scraped_notes_feed_title_reigns(spark):
    """The scraped frame is a drop-in replacement for the status-changes
    source: same column contract, survives the model's staging filters,
    and title_reigns builds against it with its normal schema."""
    from ufc_data_warehouse_spark.api import build_model
    from ufc_data_warehouse_spark.registry import REGISTRY
    from ufc_data_warehouse_spark.sources.ingest import VACANCY_TABLE
    from ufc_data_warehouse_spark.synth import ufc_raw_tables

    scraped = scrape_vacancies(spark, FIXTURE)
    sources = ufc_raw_tables(spark, "/root/testdata/sf0.001")
    sources[VACANCY_TABLE] = scraped
    built = REGISTRY.build(sources, targets=["title_reigns"])["title_reigns"]
    baseline = build_model(spark, "/root/testdata/sf0.001", "title_reigns")
    assert built.schema == baseline.schema
    assert built.count() > 0
    # the dated, fully-populated fixture notes survive the staging gate
    staged = scraped.filter(
        (F.col("date") != "") & (F.col("fighter") != "") & (F.col("weight_category") != "")
    )
    assert staged.count() == 5

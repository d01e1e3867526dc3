"""S5 — external-API detail-XML parsing (PubMed efetch shape).

Reference parity (re-derived from ``server/services/evidence.py:462-539``):
per ``PubmedArticle`` record extract pmid, title, abstract (joined
AbstractText paragraphs), journal, year with the reference's 3-stage
fallback (JournalIssue/PubDate/Year → MedlineDate regex
``(19|20)\\d{2}`` → DateCreated/Year), doi from ELocationID
(EIdType=doi), and the publication-type list.

No network in the sandbox: the fetch side is the same politeness-
scheduled pandas-UDF stage as the feed fetcher; this module covers the
parse kernel (pure, vectorizable) over XML payload strings. Year
fallback maps to a ``coalesce(...)`` chain once parsed.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["PubMedArticle", "parse_pubmed_articles", "parse_pubmed_df"]

_YEAR_RE = re.compile(r"(19|20)\d{2}")


@dataclass(frozen=True)
class PubMedArticle:
    pmid: str
    title: str
    abstract: str
    journal: str | None
    year: int | None
    doi: str | None
    publication_types: tuple[str, ...]


def parse_pubmed_articles(xml_text: str) -> list[PubMedArticle]:
    try:
        root = ET.fromstring(xml_text or "")
    except ET.ParseError:
        return []
    out: list[PubMedArticle] = []
    for article in root.findall(".//PubmedArticle"):
        medline = article.find("MedlineCitation")
        if medline is None:
            continue
        pmid = (medline.findtext("PMID") or "").strip()
        article_el = medline.find("Article")
        if not pmid or article_el is None:
            continue
        title = (article_el.findtext("ArticleTitle") or "").strip()
        abstract = "\n".join(
            (p.text or "").strip() for p in article_el.findall("Abstract/AbstractText") if p.text
        )
        journal = (article_el.findtext("Journal/Title") or "").strip() or None

        year: int | None = None
        pub_date = article_el.find("Journal/JournalIssue/PubDate")
        if pub_date is not None:
            year_text = pub_date.findtext("Year")
            if year_text and year_text.isdigit():
                year = int(year_text)
            else:
                medline_date = pub_date.findtext("MedlineDate")
                if medline_date:
                    m = _YEAR_RE.search(medline_date)
                    if m:
                        year = int(m.group(0))
        if year is None:
            fallback = medline.findtext("DateCreated/Year")
            if fallback and fallback.isdigit():
                year = int(fallback)

        doi: str | None = None
        for eloc in article_el.findall("ELocationID"):
            if eloc.get("EIdType", "").lower() == "doi":
                text = (eloc.text or "").strip()
                if text:
                    doi = text
                    break

        pub_types = tuple(
            pt.text.strip() for pt in article_el.findall("PublicationTypeList/PublicationType") if pt.text
        )
        out.append(PubMedArticle(pmid, title, abstract, journal, year, doi, pub_types))
    return out


def parse_pubmed_df(payloads: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Vectorized parse of efetch payload strings → article rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for xml_text in pdf[xml_col]:
                for a in parse_pubmed_articles(xml_text):
                    rows.append(
                        {
                            "pmid": a.pmid,
                            "title": a.title,
                            "abstract": a.abstract,
                            "journal": a.journal,
                            "year": a.year,
                            "doi": a.doi,
                            "publication_types": "|".join(a.publication_types),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["pmid", "title", "abstract", "journal", "year", "doi", "publication_types"]
            )

    return payloads.mapInPandas(
        run,
        schema="pmid string, title string, abstract string, journal string, "
        "year int, doi string, publication_types string",
    )

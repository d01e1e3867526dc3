"""S5 detail-XML parse parity (scenarios mirror the reference's
extraction rules without copying its fixtures)."""

from podcast_plow_spark.sources.pubmed import parse_pubmed_articles

XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle><MedlineCitation>
    <PMID>11111</PMID>
    <Article>
      <Journal><Title>J Test</Title>
        <JournalIssue><PubDate><Year>2021</Year></PubDate></JournalIssue></Journal>
      <ArticleTitle>Creatine and memory</ArticleTitle>
      <Abstract><AbstractText>Part one.</AbstractText><AbstractText>Part two.</AbstractText></Abstract>
      <ELocationID EIdType="pii">S123</ELocationID>
      <ELocationID EIdType="doi">10.1/abc</ELocationID>
      <PublicationTypeList><PublicationType>Randomized Controlled Trial</PublicationType></PublicationTypeList>
    </Article>
  </MedlineCitation></PubmedArticle>
  <PubmedArticle><MedlineCitation>
    <PMID>22222</PMID>
    <Article>
      <Journal><JournalIssue><PubDate><MedlineDate>Winter 1998-1999</MedlineDate></PubDate></JournalIssue></Journal>
      <ArticleTitle>Medline date fallback</ArticleTitle>
    </Article>
  </MedlineCitation></PubmedArticle>
  <PubmedArticle><MedlineCitation>
    <PMID>33333</PMID>
    <DateCreated><Year>2005</Year></DateCreated>
    <Article><ArticleTitle>DateCreated fallback</ArticleTitle>
      <Journal><JournalIssue><PubDate><MedlineDate>no year here</MedlineDate></PubDate></JournalIssue></Journal>
    </Article>
  </MedlineCitation></PubmedArticle>
  <PubmedArticle><MedlineCitation><PMID></PMID><Article/></MedlineCitation></PubmedArticle>
</PubmedArticleSet>
"""


def test_full_record():
    a = parse_pubmed_articles(XML)[0]
    assert a.pmid == "11111"
    assert a.title == "Creatine and memory"
    assert a.abstract == "Part one.\nPart two."
    assert a.journal == "J Test"
    assert a.year == 2021
    assert a.doi == "10.1/abc"
    assert a.publication_types == ("Randomized Controlled Trial",)


def test_year_fallback_chain():
    arts = parse_pubmed_articles(XML)
    assert arts[1].year == 1998  # MedlineDate regex
    assert arts[2].year == 2005  # DateCreated fallback


def test_missing_pmid_dropped_and_bad_xml_safe():
    assert len(parse_pubmed_articles(XML)) == 3
    assert parse_pubmed_articles("<broken") == []
    assert parse_pubmed_articles("") == []


def test_spotify_id_col(spark):
    from pyspark.sql import functions as F

    from podcast_plow_spark.sources.feeds import spotify_id_col

    df = spark.createDataFrame(
        [("https://open.spotify.com/episode/AbC123?si=x",), ("https://example.com/ep/9",)],
        "link string",
    )
    got = [r["sid"] for r in df.select(spotify_id_col(F.col("link")).alias("sid")).collect()]
    assert got == ["AbC123", None]

"""Cleaner-class tests over the dirty_rides fixture (FIXTURES.md §2) —
golden QA-log expectations compared on (PK, coluna, nivel_erro,
valor_considerado) per FIXTURES.md §2b (motivo/timestamps are not
hash-stable).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastetl_spark.plans.cleaners import (
    CPFCleaner,
    DecimalCommaCleaner,
    DuplicatedRowCleaner,
    GeoPointCleaner,
    MappingCleaner,
    TextCropCleaner,
    UFCleaner,
)
from fastetl_spark.plans.qa import CleaningPipeline, QALogLevel


@pytest.fixture()
def dirty_rides(spark):
    rows = [
        # qru, lat_str, cpf, uf, desc
        (1, "-15,79", "123.456.789-09", "DF", "ok"),
        (1, "-15,79", "123.456.789-09", "DF", "dup of 1"),
        (2, "-1579000.0", "11144477735", "df ", "scale err lat"),
        (3, "200.0", "00000000000", "XX", "out of bounds + bad cpf + bad uf"),
        (4, "abc", "5281105", "SP", "garbage float, short cpf valid after left-pad"),
        (5, "12.5", "52811775", "rj", "x" * 150),
    ]
    return spark.createDataFrame(
        rows, "qru_corrida long, origem_latitude string, cpf string, uf string, descricao string"
    )


def qa_key_set(qa):
    return {
        (r.primary_keys_values, r.coluna, r.nivel_erro, r.valor_considerado)
        for r in qa.collect()
    }


def test_duplicated_row_cleaner(spark, dirty_rides):
    cleaner = DuplicatedRowCleaner(["qru_corrida"], order_by=["descricao"], tabela="rides")
    cleaned, qa = cleaner.clean(dirty_rides)
    assert cleaned.count() == 5
    assert cleaned.filter(F.col("qru_corrida") == 1).count() == 1
    keys = qa_key_set(qa)
    assert ("1", "qru_corrida", QALogLevel.DROP_LINE, None) in keys
    assert len(keys) == 1


def test_decimal_comma_cleaner(spark, dirty_rides):
    cleaner = DecimalCommaCleaner(["qru_corrida"], "origem_latitude", tabela="rides")
    cleaned, qa = cleaner.clean(dirty_rides)
    vals = {r.qru_corrida: r.origem_latitude for r in cleaned.collect()}
    assert vals[1] == pytest.approx(-15.79)
    assert vals[4] is None  # 'abc' -> CAST_NULL
    keys = qa_key_set(qa)
    assert ("4", "origem_latitude", QALogLevel.CAST_NULL, None) in keys
    assert ("1", "origem_latitude", QALogLevel.CAST_FIX, "-15.79") in keys


def test_geo_point_cleaner(spark, dirty_rides):
    comma = DecimalCommaCleaner(["qru_corrida"], "origem_latitude", tabela="rides")
    geo = GeoPointCleaner(["qru_corrida"], "origem_latitude", "origem_latitude", tabela="rides")
    df, _ = comma.clean(dirty_rides)
    # use a single column twice is degenerate; build a proper pair
    df = df.withColumn("origem_longitude", F.col("origem_latitude"))
    geo = GeoPointCleaner(["qru_corrida"], "origem_latitude", "origem_longitude", tabela="rides")
    cleaned, qa = geo.clean(df)
    vals = {r.qru_corrida: (r.origem_latitude, r.origem_longitude) for r in cleaned.collect()}
    assert vals[2][0] == pytest.approx(-15.79)  # scale repaired
    assert vals[3][0] is None  # 200 out of latitude bounds
    assert vals[3][1] is None  # 200 out of longitude bounds too
    assert vals[5][1] == pytest.approx(12.5)  # in-bounds value untouched
    keys = qa_key_set(qa)
    assert ("3", "origem_latitude", QALogLevel.CAST_NULL, None) in keys
    assert any(k[0] == "2" and k[2] == QALogLevel.CAST_FIX for k in keys)


def test_cpf_cleaner(spark, dirty_rides):
    cleaner = CPFCleaner(["qru_corrida"], "cpf", tabela="rides")
    cleaned, qa = cleaner.clean(dirty_rides)
    vals = {r.qru_corrida: r.cpf for r in cleaned.collect()}
    assert vals[1] == "12345678909"  # separators stripped, valid
    assert vals[2] == "11144477735"  # canonical valid CPF
    assert vals[3] is None  # all zeros
    assert vals[4] == "00005281105"  # left-padded, check digits hold
    keys = qa_key_set(qa)
    assert ("3", "cpf", QALogLevel.CAST_NULL, None) in keys
    assert ("1", "cpf", QALogLevel.CAST_FIX, "12345678909") in keys


def test_uf_cleaner(spark, dirty_rides):
    cleaner = UFCleaner(["qru_corrida"], "uf", tabela="rides")
    cleaned, qa = cleaner.clean(dirty_rides)
    vals = {r.qru_corrida: r.uf for r in cleaned.collect()}
    assert vals[1] == "DF"
    assert vals[2] == "DF"  # trimmed + uppercased
    assert vals[3] is None  # XX invalid
    assert vals[5] == "RJ"
    keys = qa_key_set(qa)
    assert ("3", "uf", QALogLevel.CAST_NULL, None) in keys


def test_text_crop_cleaner(spark, dirty_rides):
    cleaner = TextCropCleaner(["qru_corrida"], "descricao", size=100, tabela="rides")
    cleaned, qa = cleaner.clean(dirty_rides)
    vals = {r.qru_corrida: r.descricao for r in cleaned.collect()}
    assert len(vals[5]) == 100 and vals[5].endswith("...")
    assert vals[2] == "scale err lat"  # short text untouched
    assert qa.count() == 1


def test_mapping_cleaner(spark, dirty_rides):
    mapping = spark.createDataFrame(
        [("df ", "DF-CANON"), ("rj", "RJ-CANON")], "dirty_value string, valor_canonico string"
    )
    cleaner = MappingCleaner(["qru_corrida"], "uf", mapping, tabela="rides")
    cleaned, qa = cleaner.clean(dirty_rides)
    vals = {r.qru_corrida: r.uf for r in cleaned.collect()}
    assert vals[2] == "DF-CANON"
    assert vals[5] == "RJ-CANON"
    assert vals[1] == "DF"  # unmapped passes through
    assert qa.count() == 2


def test_cleaning_pipeline_chains_and_unions_qa(spark, dirty_rides):
    pipeline = CleaningPipeline(
        [
            DuplicatedRowCleaner(["qru_corrida"], order_by=["descricao"], tabela="rides"),
            DecimalCommaCleaner(["qru_corrida"], "origem_latitude", tabela="rides"),
            UFCleaner(["qru_corrida"], "uf", tabela="rides"),
        ]
    )
    cleaned, qa = pipeline.run(dirty_rides)
    assert cleaned.count() == 5
    levels = {r.nivel_erro for r in qa.collect()}
    assert QALogLevel.DROP_LINE in levels
    assert QALogLevel.CAST_FIX in levels
    assert QALogLevel.CAST_NULL in levels

"""Data-dictionary generation (K9 — reference utils/odf_tables.py:384-488
and datapackage_to_datadictionary_operator.py:19-123).

The reference renders a Frictionless data package into an OpenDocument
text file with one 3-column table (name / type / description) per
resource. odfpy is not available here, so the renderer targets Markdown
and a dict structure (the ODT writer would be a thin driver-side swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fastetl_spark.meta.comments import get_column_comments


def dictionary_entries(df: DataFrame) -> list[dict[str, str]]:
    comments = get_column_comments(df)
    return [
        {
            "name": f.name,
            "type": f.dataType.simpleString(),
            "description": comments.get(f.name, ""),
        }
        for f in df.schema.fields
    ]


def to_markdown(resources: dict[str, DataFrame]) -> str:
    """One table per resource, mirroring the ODT layout
    (odf_tables.py:405-415: header row Nome/Tipo/Descrição)."""
    lines: list[str] = ["# Dicionário de Dados", ""]
    for name, df in resources.items():
        lines += [f"## {name}", "", "| Nome | Tipo | Descrição |", "|---|---|---|"]
        for e in dictionary_entries(df):
            lines.append(f"| {e['name']} | {e['type']} | {e['description']} |")
        lines.append("")
    return "\n".join(lines)


def write_markdown(resources: dict[str, DataFrame], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(to_markdown(resources))

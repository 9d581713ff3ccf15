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


def dictionary_resource(
    df: DataFrame, title: str | None = None, description: str | None = None
) -> dict:
    """Bridge a DataFrame into the resource dict the ODT renderer
    consumes (name/type/description per field, like a Frictionless
    resource schema)."""
    return {
        "title": title,
        "description": description,
        "fields": dictionary_entries(df),
    }


def write_odt(
    resources: dict[str, DataFrame],
    path: str,
    lang: str = "pt",
    titles: dict[str, str] | None = None,
    descriptions: dict[str, str] | None = None,
) -> None:
    """K9 in the reference's native format: one named table per
    resource in an OpenDocument text file (odf_tables.py:384-430).
    Markdown (`write_markdown`) stays the default rendering."""
    from fastetl_spark.meta.odt import create_data_dictionary

    create_data_dictionary(
        {
            name: dictionary_resource(
                df,
                title=(titles or {}).get(name),
                description=(descriptions or {}).get(name),
            )
            for name, df in resources.items()
        },
        path,
        lang=lang,
    )

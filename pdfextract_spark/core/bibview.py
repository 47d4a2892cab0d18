"""BibTeX sink (SURVEY.md S7, ``view/bib_view.rb:9-38``).

The reference fetches rendered BibTeX from dx.doi.org per resolved DOI
(content negotiation) — a network round-trip per reference.  Here the
entry is formatted locally from the resolved/catalog fields, which is
what the fetched payload contains anyway; only the network fetch is
out of scope in this container.  Key shape mirrors bib_view.rb's
``<first-author-surname><year>`` convention.
"""

from __future__ import annotations


def _bib_escape(s: str) -> str:
    return (
        str(s)
        .replace("\\", "\\\\")
        .replace("{", "\\{")
        .replace("}", "\\}")
    )


def bib_entry(row: dict) -> str:
    """One resolved reference row -> a BibTeX ``@article`` entry.
    Expects any of: doi, title, author, year, journal, pages, score.
    Unresolved rows (no doi) render as ``@misc`` with the raw citation
    in ``note`` (bib_view.rb skips them; keeping them makes the output
    lossless and greppable)."""
    doi = row.get("doi")
    year = row.get("year") or ""
    author = row.get("author") or ""
    # 'Surname, Given' lists the surname first — split on ',' before
    # falling back to last-whitespace-token for 'Given Surname'
    first_author = author.split(" and ")[0].strip()
    if "," in first_author:
        surname = first_author.split(",")[0].strip()
    else:
        surname = first_author.split()[-1] if first_author else "anon"
    surname = "".join(ch for ch in surname if ch.isalnum()) or "anon"
    key = f"{surname.lower()}{year}" if (author or year) else "unresolved"
    fields = []
    for name in ("title", "author", "journal", "pages"):
        v = row.get(name)
        if v:
            fields.append(f"  {name} = {{{_bib_escape(v)}}}")
    if year:
        fields.append(f"  year = {{{year}}}")
    if doi:
        fields.append(f"  doi = {{{_bib_escape(doi)}}}")
        body = ",\n".join(fields)
        return f"@article{{{key},\n{body}\n}}"
    note = _bib_escape(row.get("content") or "")
    return f"@misc{{{key},\n  note = {{{note}}}\n}}"


def render_bib(rows: list[dict]) -> str:
    """Rows -> one BibTeX document (bib_view.rb renders one entry per
    resolved reference)."""
    return "\n\n".join(bib_entry(r) for r in rows) + ("\n" if rows else "")

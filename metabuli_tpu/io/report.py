"""Result writers: per-read classifications, Kraken2-style report, Krona.

Byte-format mirrors the reference's ``Reporter``
(`/root/reference/src/commons/Reporter.cpp`):

  * ``<job>_classifications.tsv`` — header + one row per read
    (`Reporter.cpp:35-80`); classified rows end with "taxid:count " pairs,
    unclassified rows with a literal "-\\t".
  * ``<job>_report.tsv`` — recursive clade counts, children in descending
    clade-count order (`Reporter.cpp:162-193`).
  * ``<job>_krona.html`` — Krona XML wrapped in a minimal standalone page
    (`Reporter.cpp:86-113`; the reference embeds the Krona prelude resource
    from MMseqs2, we ship our own lightweight prelude).
"""

from __future__ import annotations

import xml.sax.saxutils

from ..db.taxonomy import Taxonomy


def format_float(x: float) -> str:
    """C++ ostream default formatting (6 significant digits)."""
    s = f"{x:.6g}"
    return s


class Reporter:
    def __init__(self, taxonomy: Taxonomy, print_lineage: bool = False):
        self.tax = taxonomy
        self.print_lineage = print_lineage

    # ------------------------------------------------------- classifications
    def write_classifications(self, fh, results, first: bool = True):
        """``results``: iterable of (name, ReadClassification, read_len)."""
        if first:
            fh.write("#is_classified\tname\ttaxID\tquery_length\tscore\trank")
            if self.print_lineage:
                fh.write("\tlineage")
            fh.write("\ttaxID:match_count\n")
        tax = self.tax
        for name, rc, read_len in results:
            if rc.is_classified:
                fh.write(
                    f"1\t{name}\t{tax.to_original(rc.taxid)}\t{read_len}\t"
                    f"{format_float(rc.score)}\t{tax.rank_of(rc.taxid)}\t"
                )
                if self.print_lineage:
                    fh.write(f"{tax.lineage(rc.taxid)}\t")
                for t in sorted(rc.tax_counts):
                    fh.write(f"{tax.to_original(t)}:{rc.tax_counts[t]} ")
                fh.write("\n")
            else:
                fh.write(
                    f"0\t{name}\t0\t{read_len}\t{format_float(rc.score)}\t-\t"
                )
                if self.print_lineage:
                    fh.write("-\t")
                fh.write("-\t\n")

    # ----------------------------------------------------------------- report
    def write_report(self, fh, tax_counts: dict[int, int], total_reads: int):
        """Kraken2-style clade report (`Reporter.cpp:115-193`)."""
        fh.write("#clade_proportion\tclade_count\ttaxon_count\trank\ttaxID\tname\n")
        clade = self.tax.clade_counts(
            {t: c for t, c in tax_counts.items() if t > 0}
        )
        unclassified = tax_counts.get(0, 0)
        if unclassified > 0:
            fh.write(
                f"{100 * unclassified / max(1, total_reads):.4f}\t{unclassified}\t"
                f"{unclassified}\tno rank\t0\tunclassified\n"
            )
        self._report_node(fh, clade, total_reads, 1, 0)

    def _report_node(self, fh, clade, total, taxid, depth):
        entry = clade.get(taxid)
        if entry is None or entry["cladeCount"] == 0:
            return
        tax = self.tax
        fh.write(
            f"{100 * entry['cladeCount'] / max(1, total):.4f}\t"
            f"{entry['cladeCount']}\t{entry['taxCount']}\t"
            f"{tax.rank_of(taxid)}\t{tax.to_original(taxid)}\t"
            f"{'  ' * depth}{tax.name_of(taxid)}\n"
        )
        children = sorted(
            entry["children"],
            key=lambda c: -clade.get(c, {"cladeCount": 0})["cladeCount"],
        )
        for ch in children:
            self._report_node(fh, clade, total, ch, depth + 1)

    # ------------------------------------------------------------------ krona
    def write_krona(self, fh, tax_counts: dict[int, int], total_reads: int):
        clade = self.tax.clade_counts({t: c for t, c in tax_counts.items() if t > 0})
        fh.write(_KRONA_PRELUDE)
        fh.write(
            f'<node name="all"><magnitude><val>{total_reads}</val></magnitude>'
        )
        unclassified = tax_counts.get(0, 0)
        if unclassified > 0:
            fh.write(
                f'<node name="unclassified"><magnitude><val>{unclassified}</val>'
                "</magnitude></node>"
            )
        self._krona_node(fh, clade, 1)
        fh.write("</node></krona></div></body></html>")

    def _krona_node(self, fh, clade, taxid):
        entry = clade.get(taxid)
        if entry is None or entry["cladeCount"] == 0:
            return
        name = xml.sax.saxutils.quoteattr(self.tax.name_of(taxid))
        fh.write(
            f"<node name={name}><magnitude><val>{entry['cladeCount']}</val></magnitude>"
        )
        children = sorted(
            entry["children"],
            key=lambda c: -clade.get(c, {"cladeCount": 0})["cladeCount"],
        )
        for ch in children:
            self._krona_node(fh, clade, ch)
        fh.write("</node>")


_KRONA_PRELUDE = """<!DOCTYPE html>
<html><head><meta charset="utf-8">
<title>Krona chart</title>
<script src="https://marbl.github.io/Krona/src/krona-2.0.js"></script>
</head>
<body><div style="display:none" class="krona"><krona collapse="true" key="true">
<attributes magnitude="magnitude"><attribute display="Count">magnitude</attribute></attributes>
"""

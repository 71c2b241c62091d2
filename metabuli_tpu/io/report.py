"""Result writers: per-read classifications, Kraken2-style report, Krona.

Byte-format mirrors the reference's ``Reporter``
(`/root/reference/src/commons/Reporter.cpp`):

  * ``<job>_classifications.tsv`` — header + one row per read
    (`Reporter.cpp:35-80`); classified rows end with "taxid:count " pairs,
    unclassified rows with a literal "-\\t".
  * ``<job>_report.tsv`` — recursive clade counts, children in descending
    clade-count order (`Reporter.cpp:162-193`).
  * ``<job>_krona.html`` — Krona-compatible XML island plus an embedded
    zero-dependency SVG sunburst renderer, fully self-contained
    (`Reporter.cpp:86-113`; the reference embeds MMseqs2's krona prelude
    resource — same idea, no network access needed either way).
"""

from __future__ import annotations


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
    def classification_header(self) -> str:
        h = "#is_classified\tname\ttaxID\tquery_length\tscore\trank"
        if self.print_lineage:
            h += "\tlineage"
        return h + "\ttaxID:match_count\n"

    def classification_row(self, name, rc, read_len) -> str:
        tax = self.tax
        if rc.is_classified:
            row = (
                f"1\t{name}\t{tax.to_original(rc.taxid)}\t{read_len}\t"
                f"{format_float(rc.score)}\t{tax.rank_of(rc.taxid)}\t"
            )
            if self.print_lineage:
                row += f"{tax.lineage(rc.taxid)}\t"
            for t in sorted(rc.tax_counts):
                row += f"{tax.to_original(t)}:{rc.tax_counts[t]} "
            return row + "\n"
        row = f"0\t{name}\t0\t{read_len}\t{format_float(rc.score)}\t-\t"
        if self.print_lineage:
            row += "-\t"
        return row + "-\t\n"

    def write_classifications(self, fh, results, first: bool = True):
        """``results``: iterable of (name, ReadClassification, read_len)."""
        if first:
            fh.write(self.classification_header())
        for name, rc, read_len in results:
            fh.write(self.classification_row(name, rc, read_len))

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
    def write_krona(self, fh, tax_counts: dict[int, int], total_reads: int,
                    prelude: str | None = None):
        """Krona chart (`Reporter.cpp:86-113,135-160`).

        With ``prelude`` (the bundled MMseqs2/KronaTools
        ``krona_prelude.html`` resource, absent from this checkout —
        supply one via ``--krona-prelude``), the output is byte-identical
        to the reference writer: prelude + node stream +
        ``</node></krona></div></body></html>``. Without one, a
        self-contained zero-dependency viewer wraps the SAME node stream
        (the ``<krona>`` XML island is what Krona tooling parses)."""
        clade = self.tax.clade_counts({t: c for t, c in tax_counts.items() if t > 0})
        fh.write(_KRONA_PRELUDE if prelude is None else prelude)
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
        fh.write("</node></krona></div>")
        if prelude is None:
            fh.write(_KRONA_EPILOGUE)
        else:
            fh.write("</body></html>")

    @staticmethod
    def _escape_attribute(name: str) -> str:
        """Reference escapeAttribute: the five XML specials, always
        (`taxonomyreport.cpp`, textually included at `Reporter.cpp:2`)."""
        return (name.replace("&", "&amp;").replace('"', "&quot;")
                .replace("'", "&apos;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def _krona_node(self, fh, clade, taxid):
        entry = clade.get(taxid)
        if entry is None or entry["cladeCount"] == 0:
            return
        name = self._escape_attribute(self.tax.name_of(taxid))
        fh.write(
            f'<node name="{name}"><magnitude><val>{entry["cladeCount"]}</val></magnitude>'
        )
        # children arrive in id order (getParentToChildren iterates nodes
        # in index order); the reference sorts by cladeCount descending
        children = sorted(
            entry["children"],
            key=lambda c: -clade.get(c, {"cladeCount": 0})["cladeCount"],
        )
        for ch in children:
            self._krona_node(fh, clade, ch)
        fh.write("</node>")


# Self-contained page: the Krona-compatible XML island (parsable by real
# Krona tooling) plus an embedded zero-dependency sunburst renderer, the
# analogue of the reference's bundled krona prelude resource
# (`Reporter.cpp:155`). No network access required.
_KRONA_PRELUDE = """<!DOCTYPE html>
<html><head><meta charset="utf-8">
<title>Krona chart</title>
<style>
body{font-family:sans-serif;margin:0;background:#fff}
#wrap{display:flex;height:100vh}
#chart{flex:1}
#side{width:260px;padding:12px;border-left:1px solid #ddd;overflow:auto}
#side h2{font-size:15px;margin:4px 0}
#side .cnt{color:#666;font-size:13px}
#crumb{font-size:12px;color:#369;cursor:pointer;margin-bottom:8px}
path{stroke:#fff;stroke-width:.5;cursor:pointer}
path:hover{opacity:.8}
text.lbl{font-size:11px;pointer-events:none;fill:#222}
</style>
</head>
<body><div style="display:none" class="krona"><krona collapse="true" key="true">
<attributes magnitude="magnitude"><attribute display="Count">magnitude</attribute></attributes>
"""

_KRONA_EPILOGUE = """
<div id="wrap"><svg id="chart"></svg><div id="side">
<div id="crumb"></div><h2 id="selname">&nbsp;</h2><div id="selcnt" class="cnt"></div>
</div></div>
<script>
(function(){
"use strict";
function parse(el){var node={name:el.getAttribute("name")||"",count:0,kids:[]};
 var m=el.querySelector(":scope > magnitude > val");
 if(m)node.count=parseFloat(m.textContent)||0;
 el.querySelectorAll(":scope > node").forEach(function(c){node.kids.push(parse(c));});
 return node;}
var rootEl=document.querySelector("krona > node");if(!rootEl)return;
var root=parse(rootEl);
var svg=document.getElementById("chart");
var NS="http://www.w3.org/2000/svg";
var W=svg.clientWidth||700,H=svg.clientHeight||700,R=Math.min(W,H)/2-10;
svg.setAttribute("viewBox",(-W/2)+" "+(-H/2)+" "+W+" "+H);
function color(d,i){var h=(i*67)%360,l=62-Math.min(d*6,24);
 return "hsl("+h+",62%,"+l+"%)";}
var focus=root,crumbs=[];
function arcPath(a0,a1,r0,r1){
 var c=function(a,r){return [r*Math.sin(a),-r*Math.cos(a)];};
 if(a1-a0>=2*Math.PI-1e-6){a1=a0+2*Math.PI-1e-6;}
 var p00=c(a0,r0),p01=c(a1,r0),p10=c(a0,r1),p11=c(a1,r1);
 var large=(a1-a0)>Math.PI?1:0;
 return "M"+p10[0]+","+p10[1]+"A"+r1+","+r1+" 0 "+large+" 1 "+p11[0]+","+p11[1]+
        "L"+p01[0]+","+p01[1]+"A"+r0+","+r0+" 0 "+large+" 0 "+p00[0]+","+p00[1]+"Z";}
function depth(n){var d=1;n.kids.forEach(function(k){d=Math.max(d,1+depth(k));});return d;}
function render(){
 while(svg.firstChild)svg.removeChild(svg.firstChild);
 var maxd=Math.min(depth(focus),6),ring=R/(maxd+0.4),ci=0;
 document.getElementById("selname").textContent=focus.name;
 document.getElementById("selcnt").textContent=focus.count+" reads";
 var cr=document.getElementById("crumb");
 cr.textContent=crumbs.length?("\\u2190 "+crumbs.map(function(c){return c.name;}).join(" / ")):"";
 function draw(node,a0,a1,d){
  if(d>maxd||node.count<=0)return;
  var p=document.createElementNS(NS,"path");
  p.setAttribute("d",arcPath(a0,a1,(d-1)*ring+(d>1?ring*0.4:0),d*ring));
  p.setAttribute("fill",d===1?"#eee":color(d,ci++));
  p.addEventListener("click",function(){
   if(node!==focus){crumbs.push(focus);focus=node;render();}});
  var t=document.createElementNS(NS,"title");
  t.textContent=node.name+": "+node.count;
  p.appendChild(t);svg.appendChild(p);
  if(a1-a0>0.25&&d>1){
   var mid=(a0+a1)/2,r=(d-0.3)*ring;
   var tx=document.createElementNS(NS,"text");
   tx.setAttribute("class","lbl");
   tx.setAttribute("x",r*Math.sin(mid));tx.setAttribute("y",-r*Math.cos(mid));
   tx.setAttribute("text-anchor","middle");
   tx.textContent=node.name.trim().slice(0,Math.max(3,Math.floor((a1-a0)*r/7)));
   svg.appendChild(tx);}
  var assigned=0;node.kids.forEach(function(k){assigned+=k.count;});
  var a=a0,span=a1-a0,base=node.count||1;
  node.kids.slice().sort(function(x,y){return y.count-x.count;})
   .forEach(function(k){var w=span*k.count/base;draw(k,a,a+w,d+1);a+=w;});
 }
 draw(focus,0,2*Math.PI,1);
}
document.getElementById("crumb").addEventListener("click",function(){
 if(crumbs.length){focus=crumbs.pop();render();}});
window.addEventListener("resize",render);
render();
})();
</script>
</body></html>"""

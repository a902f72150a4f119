// Poset closure for greedy MSA column merging (the consistency structure
// behind getMultipleSequenceAlignment, reference impl/multipleAligner.c:
// 272-297, where sonLib's stPosetAlignment plays this role).
//
// Exact native mirror of msa/multiple_aligner.py::_Poset (pure integer
// ops, so decisions are bit-identical to the numpy backend):
//   le[u][v][x] = min y such that the column holding (u, x) precedes or
//                 equals the column holding (v, y)   (BIG when unrelated)
//   ge[u][v][x] = max y such that the column holding (v, y) precedes or
//                 equals the column holding (u, x)   (-1 when unrelated)
// Both monotone non-decreasing in x.  The numpy backend rewrites whole
// prefixes/suffixes per merge (memory-bound); here every update is
// range-trimmed with a binary search so only entries that actually
// change are written — per merge O(n^2 log L + writes-that-change).

#include <algorithm>
#include <cstdint>
#include <cstdlib>

namespace {

constexpr int32_t BIG = 1 << 30;

struct Poset {
    int n;
    int64_t lmax;
    int32_t *le;
    int32_t *ge;
    int32_t *scratch;  // 2*n ints: out, inn

    int32_t *le_row(int u, int v) const {
        return le + ((int64_t)u * n + v) * lmax;
    }
    int32_t *ge_row(int u, int v) const {
        return ge + ((int64_t)u * n + v) * lmax;
    }
};

}  // namespace

extern "C" {

void *poset_new(int n, const int64_t *lengths) {
    Poset *p = new Poset;
    p->n = n;
    int64_t lmax = 0;
    for (int i = 0; i < n; ++i) lmax = std::max(lmax, lengths[i]);
    p->lmax = lmax;
    int64_t total = (int64_t)n * n * lmax;
    p->le = (int32_t *)malloc(total * sizeof(int32_t));
    p->ge = (int32_t *)malloc(total * sizeof(int32_t));
    p->scratch = (int32_t *)malloc(2 * (size_t)n * sizeof(int32_t));
    if (!p->le || !p->ge || !p->scratch) {
        // NULL handle: the caller falls back to the numpy backend (which
        // raises a catchable MemoryError) instead of faulting here
        free(p->le);
        free(p->ge);
        free(p->scratch);
        delete p;
        return nullptr;
    }
    std::fill(p->le, p->le + total, BIG);
    std::fill(p->ge, p->ge + total, (int32_t)-1);
    for (int u = 0; u < n; ++u) {
        int32_t *lrow = p->le_row(u, u);
        int32_t *grow = p->ge_row(u, u);
        for (int64_t x = 0; x < lengths[u]; ++x) {
            lrow[x] = (int32_t)x;
            grow[x] = (int32_t)x;
        }
    }
    return p;
}

void poset_free(void *h) {
    Poset *p = (Poset *)h;
    free(p->le);
    free(p->ge);
    free(p->scratch);
    delete p;
}

// 1 iff neither column strictly precedes the other (merge is consistent).
int poset_consistent(void *h, int ka, const int32_t *sa, const int32_t *pa,
                     int kb, const int32_t *sb, const int32_t *pb) {
    Poset *p = (Poset *)h;
    for (int i = 0; i < ka; ++i) {
        const int32_t *row = p->le + (int64_t)sa[i] * p->n * p->lmax;
        for (int j = 0; j < kb; ++j)
            if (row[(int64_t)sb[j] * p->lmax + pa[i]] <= pb[j]) return 0;
    }
    for (int j = 0; j < kb; ++j) {
        const int32_t *row = p->le + (int64_t)sb[j] * p->n * p->lmax;
        for (int i = 0; i < ka; ++i)
            if (row[(int64_t)sa[i] * p->lmax + pb[j]] <= pa[i]) return 0;
    }
    return 1;
}

// Record that the columns with members (ss, pp)[0:k] merged into one.
// Call only after poset_consistent said yes for the two halves.
void poset_merge(void *h, int k, const int32_t *ss, const int32_t *pp) {
    Poset *p = (Poset *)h;
    const int n = p->n;
    const int64_t lmax = p->lmax;
    int32_t *out = p->scratch;      // min y: C <= (v, y)
    int32_t *inn = p->scratch + n;  // max x: (u, x) <= C
    std::fill(out, out + n, BIG);
    std::fill(inn, inn + n, (int32_t)-1);
    for (int m = 0; m < k; ++m) {
        const int32_t s = ss[m], q = pp[m];
        for (int v = 0; v < n; ++v) {
            out[v] = std::min(out[v], p->le_row(s, v)[q]);
            inn[v] = std::max(inn[v], p->ge_row(s, v)[q]);
        }
    }
    for (int u = 0; u < n; ++u) {
        const int32_t hi = inn[u];
        if (hi < 0) continue;
        for (int v = 0; v < n; ++v) {
            const int32_t o = out[v];
            int32_t *row = p->le_row(u, v);
            if (row[hi] <= o) continue;  // monotone: whole prefix already <=
            // entries > o form a suffix of [0..hi]
            int32_t *x0 = std::upper_bound(row, row + hi + 1, o);
            std::fill(x0, row + hi + 1, o);
        }
    }
    for (int v = 0; v < n; ++v) {
        const int32_t y0 = out[v];
        if (y0 >= BIG) continue;
        for (int u = 0; u < n; ++u) {
            const int32_t i = inn[u];
            int32_t *row = p->ge_row(v, u);
            if (row[y0] >= i) continue;  // monotone: whole suffix already >=
            // entries < i form a prefix of [y0..lmax)
            int32_t *y1 = std::lower_bound(row + y0, row + lmax, i);
            std::fill(row + y0, y1, i);
        }
    }
}

}  // extern "C"

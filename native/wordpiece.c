/* GIL-free WordPiece tokenizer for the ASCII fast path.
 *
 * Native twin of d2r_tpu/data/tokenizer.py (BasicTokenizer + greedy
 * longest-match-first WordPiece, HF BertTokenizer semantics; the torch
 * reference delegates to a hub-downloaded BertTokenizer,
 * ref: processor/dataset.py:20). Scope: inputs whose bytes are all < 0x80 —
 * for those, lowercasing, accent stripping (NFD identity), control/space
 * classification and punctuation splitting are exactly the ASCII subsets of
 * the Unicode rules, so this path is bit-identical to the Python
 * implementation (pinned by tests/test_native_text.py). Any non-ASCII byte
 * returns -1 and the caller falls back to Python, mirroring the
 * native->PIL image-decoder fallback chain (native/imagedec.c).
 *
 * API (ctypes, see d2r_tpu/data/native_text.py):
 *   void *d2r_wp_load(const char *vocab_path);   NULL on failure
 *   int   d2r_wp_encode(void *h, const char *text, int32_t *out, int cap);
 *         returns #ids written (<= cap), or -1 for non-ASCII input
 *   void  d2r_wp_free(void *h);
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define MAX_WORD_CHARS 100   /* matches WordPieceTokenizer.max_chars_per_word */
#define MAX_TOKEN_BYTES 512  /* vocab entries longer than this never match */

typedef struct {
  uint32_t off;   /* offset into the token arena */
  int32_t len;    /* token byte length; -1 = empty slot */
  int32_t id;
} Entry;

typedef struct {
  Entry *slots;
  uint64_t mask;      /* capacity - 1, capacity is a power of two */
  char *arena;
  size_t arena_len;
  int32_t unk_id;
} Vocab;

static uint64_t fnv1a(const char *s, size_t n) {
  uint64_t h = 1469598103934665603ULL;
  for (size_t i = 0; i < n; i++) {
    h ^= (unsigned char)s[i];
    h *= 1099511628211ULL;
  }
  return h;
}

/* insert-or-overwrite: duplicate vocab lines keep the LAST id, matching
 * Python's dict assignment in BertTokenizer.from_vocab_file */
static void vput(Vocab *v, const char *tok, size_t len, int32_t id,
                 uint32_t off) {
  uint64_t i = fnv1a(tok, len) & v->mask;
  for (;;) {
    Entry *e = &v->slots[i];
    if (e->len < 0) {
      e->off = off;
      e->len = (int32_t)len;
      e->id = id;
      return;
    }
    if ((size_t)e->len == len && memcmp(v->arena + e->off, tok, len) == 0) {
      e->id = id;
      return;
    }
    i = (i + 1) & v->mask;
  }
}

static int32_t vget(const Vocab *v, const char *tok, size_t len) {
  uint64_t i = fnv1a(tok, len) & v->mask;
  for (;;) {
    const Entry *e = &v->slots[i];
    if (e->len < 0) return -1;
    if ((size_t)e->len == len && memcmp(v->arena + e->off, tok, len) == 0)
      return e->id;
    i = (i + 1) & v->mask;
  }
}

void d2r_wp_free(void *handle) {
  Vocab *v = (Vocab *)handle;
  if (!v) return;
  free(v->slots);
  free(v->arena);
  free(v);
}

void *d2r_wp_load(const char *vocab_path) {
  FILE *f = fopen(vocab_path, "rb");
  if (!f) return NULL;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return NULL; }
  long fsize = ftell(f);
  if (fsize < 0) { fclose(f); return NULL; }
  rewind(f);

  Vocab *v = (Vocab *)calloc(1, sizeof(Vocab));
  if (!v) { fclose(f); return NULL; }
  v->arena = (char *)malloc((size_t)fsize + 1);
  if (!v->arena) { fclose(f); free(v); return NULL; }
  if (fread(v->arena, 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f); d2r_wp_free(v); return NULL;
  }
  fclose(f);
  v->arena[fsize] = '\0';
  v->arena_len = (size_t)fsize;

  /* count lines (id space), size the table at >= 2x entries */
  size_t n_lines = 1;
  for (long i = 0; i < fsize; i++)
    if (v->arena[i] == '\n') n_lines++;
  uint64_t cap = 64;
  while (cap < 2 * n_lines) cap <<= 1;
  v->slots = (Entry *)malloc(cap * sizeof(Entry));
  if (!v->slots) { d2r_wp_free(v); return NULL; }
  for (uint64_t i = 0; i < cap; i++) v->slots[i].len = -1;
  v->mask = cap - 1;
  v->unk_id = -1;

  /* tokens are lines with ONLY the trailing '\n' stripped (Python:
   * line.rstrip("\n")) — embedded '\r' from CRLF files is kept, matching
   * the Python loader byte-for-byte */
  int32_t id = 0;
  size_t start = 0;
  for (size_t i = 0; i <= v->arena_len; i++) {
    if (i == v->arena_len || v->arena[i] == '\n') {
      if (i == v->arena_len && i == start) break; /* no final empty line */
      size_t len = i - start;
      if (len <= MAX_TOKEN_BYTES)
        vput(v, v->arena + start, len, id, (uint32_t)start);
      if (len == 5 && memcmp(v->arena + start, "[UNK]", 5) == 0)
        v->unk_id = id;
      id++;
      start = i + 1;
    }
  }
  if (v->unk_id < 0) v->unk_id = 1; /* tokenizer.py default unk_token_id */
  return v;
}

static int is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

/* WordPiece one basic token into tmp_ids; returns piece count (whole-word
 * [UNK] on any unmatchable tail, matching WordPieceTokenizer.tokenize) */
static int wordpiece(const Vocab *v, const char *word, int len,
                     int32_t *tmp_ids) {
  if (len > MAX_WORD_CHARS) {
    tmp_ids[0] = v->unk_id;
    return 1;
  }
  char key[MAX_WORD_CHARS + 3];
  int n = 0, start = 0;
  while (start < len) {
    int end = len, found = -1;
    while (start < end) {
      int klen = end - start;
      const char *sub;
      if (start > 0) {
        key[0] = '#';
        key[1] = '#';
        memcpy(key + 2, word + start, (size_t)klen);
        sub = key;
        klen += 2;
      } else {
        sub = word + start;
      }
      found = vget(v, sub, (size_t)klen);
      if (found >= 0) break;
      end--;
    }
    if (found < 0) {
      tmp_ids[0] = v->unk_id;
      return 1;
    }
    tmp_ids[n++] = found;
    start = end;
  }
  return n;
}

int d2r_wp_encode(void *handle, const char *text, int32_t *out, int cap) {
  const Vocab *v = (const Vocab *)handle;
  if (!v || !text || cap < 0) return -1;

  /* one basic token at a time: cleaned, lowercased, punctuation-split.
   * A word buffer per contiguous non-punct run; punctuation chars are
   * their own tokens. Each basic token goes through wordpiece() into a
   * temp buffer FIRST (the whole-word [UNK] rule must see every piece),
   * then copies into out until cap — identical to Python's
   * tokens[:max]-after-full-tokenise truncation. */
  int n_out = 0;
  char word[MAX_WORD_CHARS + 1];
  int wlen = 0;
  int overlong = 0; /* run exceeded MAX_WORD_CHARS: single [UNK] */
  int32_t tmp[MAX_WORD_CHARS + 1];

#define FLUSH_WORD()                                                     \
  do {                                                                   \
    if (wlen > 0 || overlong) {                                          \
      int k = overlong ? (tmp[0] = v->unk_id, 1)                         \
                       : wordpiece(v, word, wlen, tmp);                  \
      for (int j = 0; j < k; j++) {                                      \
        if (n_out >= cap) return n_out;                                  \
        out[n_out++] = tmp[j];                                           \
      }                                                                  \
      wlen = 0;                                                          \
      overlong = 0;                                                      \
    }                                                                    \
  } while (0)

  for (const unsigned char *p = (const unsigned char *)text; *p; p++) {
    unsigned char c = *p;
    if (c >= 0x80) return -1; /* non-ASCII: Python fallback */
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      FLUSH_WORD();
      continue;
    }
    if (c < 0x20 || c == 0x7f) continue; /* control chars dropped */
    if (is_ascii_punct(c)) {
      FLUSH_WORD();
      word[0] = (char)c;
      wlen = 1;
      FLUSH_WORD();
      continue;
    }
    if (c >= 'A' && c <= 'Z') c += 'a' - 'A';
    if (wlen >= MAX_WORD_CHARS)
      overlong = 1; /* keep consuming the run; it becomes one [UNK] */
    else
      word[wlen++] = (char)c;
  }
  FLUSH_WORD();
#undef FLUSH_WORD
  return n_out;
}

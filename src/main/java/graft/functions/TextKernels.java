package graft.functions;

import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Text hashing kernels, static for codegen use.
 *
 * FNV-1a is also the reference's shard-routing hash
 * (/root/reference/pkg/sharding/shard.go:34-48 — SURVEY.md §2.8 F11).
 */
public final class TextKernels {
    private TextKernels() {}

    public static long fnv1a64(byte[] bytes) {
        long h = 0xcbf29ce484222325L;
        for (byte b : bytes) {
            h ^= (b & 0xffL);
            h *= 0x100000001b3L;
        }
        return h;
    }

    /**
     * 64-bit SimHash over a token array: per-token FNV-1a bit votes,
     * sign-aggregated. Null tokens are skipped.
     */
    public static long simhash64(ArrayData tokens) {
        int[] votes = new int[64];
        int n = tokens.numElements();
        for (int i = 0; i < n; i++) {
            if (tokens.isNullAt(i)) continue;
            UTF8String t = tokens.getUTF8String(i);
            long h = fnv1a64(t.getBytes());
            for (int b = 0; b < 64; b++) {
                if (((h >>> b) & 1L) == 1L) votes[b]++; else votes[b]--;
            }
        }
        long out = 0L;
        for (int b = 0; b < 64; b++) {
            if (votes[b] > 0) out |= (1L << b);
        }
        return out;
    }

    private static final ThreadLocal<java.security.MessageDigest> MD5 =
        ThreadLocal.withInitial(() -> {
            try { return java.security.MessageDigest.getInstance("MD5"); }
            catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
        });

    /**
     * MinHash signature: min over shingles of int64(first 15 hex digits of
     * md5(prefix || shingle)) — bit-identical to Spark's
     * cast(conv(substr(md5(concat(prefix, s)), 1, 15), 16, 10) as bigint)
     * (15 hex digits = the top 60 bits = big-endian first 8 bytes >>> 4),
     * without allocating the concat/hex/substr strings per evaluation.
     * Null shingles are skipped. Empty / all-null arrays return
     * Long.MAX_VALUE — unreachable as a real signature (values are 60-bit),
     * so the wrapping expression maps it to SQL NULL, matching the
     * array_min-over-transform formulation (array_min of an empty array is
     * NULL). The engine's own shingle arrays are never empty (short texts
     * fall back to a whole-text shingle), but the registered SQL function
     * sees arbitrary input.
     */
    public static long minhashSig(ArrayData shingles, byte[] prefix) {
        java.security.MessageDigest md = MD5.get();
        long min = Long.MAX_VALUE;
        int n = shingles.numElements();
        for (int i = 0; i < n; i++) {
            if (shingles.isNullAt(i)) continue;
            md.reset();
            md.update(prefix);
            md.update(shingles.getUTF8String(i).getBytes());
            byte[] d = md.digest();
            long v = ((d[0] & 0xffL) << 56 | (d[1] & 0xffL) << 48 | (d[2] & 0xffL) << 40
                    | (d[3] & 0xffL) << 32 | (d[4] & 0xffL) << 24 | (d[5] & 0xffL) << 16
                    | (d[6] & 0xffL) << 8 | (d[7] & 0xffL)) >>> 4;
            if (v < min) min = v;
        }
        return min;
    }

    /**
     * All k MinHash signature components in one pass: per shingle, the
     * UTF-8 bytes are materialized ONCE and fed to each seed's digest
     * (same md5(seed|shingle) family, bit-identical to k minhashSig
     * calls; the k-fold getBytes/UTF8String traversal is what this
     * saves). Empty / all-null input yields an all-MAX_VALUE array (the
     * wrapping expression maps it to NULL like the scalar form).
     */
    public static long[] minhashSigs(ArrayData shingles, byte[][] prefixes) {
        java.security.MessageDigest md = MD5.get();
        int k = prefixes.length;
        long[] mins = new long[k];
        java.util.Arrays.fill(mins, Long.MAX_VALUE);
        int n = shingles.numElements();
        for (int i = 0; i < n; i++) {
            if (shingles.isNullAt(i)) continue;
            byte[] s = shingles.getUTF8String(i).getBytes();
            for (int j = 0; j < k; j++) {
                md.reset();
                md.update(prefixes[j]);
                md.update(s);
                byte[] d = md.digest();
                long v = ((d[0] & 0xffL) << 56 | (d[1] & 0xffL) << 48 | (d[2] & 0xffL) << 40
                        | (d[3] & 0xffL) << 32 | (d[4] & 0xffL) << 24 | (d[5] & 0xffL) << 16
                        | (d[6] & 0xffL) << 8 | (d[7] & 0xffL)) >>> 4;
                if (v < mins[j]) mins[j] = v;
            }
        }
        return mins;
    }

    /**
     * Winnowing fingerprints (Schleimer/Wilkerson/Aiken): FNV-1a over each
     * char k-gram's UTF-8 bytes, then the DISTINCT minima of every window
     * of w consecutive gram hashes, returned SORTED (signed order — the
     * same order Spark's array_min uses on longs). Texts shorter than k
     * chars yield the whole-text hash. Monotonic-deque window minima:
     * O(n·k) hashing + O(n) selection, zero per-gram allocation — the
     * nested-lambda Column formulation allocates a UTF8String per gram and
     * an array per window.
     */
    public static long[] winnow(UTF8String text, int k, int w) {
        byte[] bytes = text.getBytes();
        int[] offsets = new int[text.numChars() + 1];
        int nc = 0;
        for (int i = 0; i < bytes.length; ) {
            offsets[nc++] = i;
            i += UTF8String.numBytesForFirstByte(bytes[i]);
        }
        offsets[nc] = bytes.length;
        if (nc < k) return new long[] { fnv1a64(bytes) };
        int numGrams = nc - k + 1;
        long[] hashes = new long[numGrams];
        for (int g = 0; g < numGrams; g++) {
            long h = 0xcbf29ce484222325L;
            int end = offsets[g + k];
            for (int i = offsets[g]; i < end; i++) {
                h ^= (bytes[i] & 0xffL);
                h *= 0x100000001b3L;
            }
            hashes[g] = h;
        }
        int wEff = Math.min(w, numGrams);
        int numWins = numGrams - wEff + 1;
        int[] deque = new int[numGrams]; // indices, hashes increasing
        int head = 0, tail = 0;          // live range [head, tail)
        long[] mins = new long[numWins];
        int m = 0;
        for (int g = 0; g < numGrams; g++) {
            while (tail > head && hashes[deque[tail - 1]] >= hashes[g]) tail--;
            deque[tail++] = g;
            if (deque[head] <= g - wEff) head++;
            if (g >= wEff - 1) mins[m++] = hashes[deque[head]];
        }
        java.util.Arrays.sort(mins);
        int out = 0;
        for (int i = 0; i < mins.length; i++) {
            if (out == 0 || mins[out - 1] != mins[i]) mins[out++] = mins[i];
        }
        return java.util.Arrays.copyOf(mins, out);
    }

    /**
     * |a ∩ b| of two SORTED, DISTINCT string arrays by a single merge pass
     * (UTF8String binary order — what Spark's array_sort produces).
     * Zero allocation per call, unlike array_intersect's per-evaluation
     * hash set.
     */
    public static int sortedIntersectCount(ArrayData a, ArrayData b) {
        final int na = a.numElements(), nb = b.numElements();
        int i = 0, j = 0, n = 0;
        while (i < na && j < nb) {
            UTF8String x = a.getUTF8String(i);
            UTF8String y = b.getUTF8String(j);
            int c = x.compareTo(y);
            if (c == 0) { n++; i++; j++; }
            else if (c < 0) i++;
            else j++;
        }
        return n;
    }

    // Text canonicalization — the ingest-side cleanup every corpus pass
    // runs first. Order and character classes are chosen for bit parity
    // with the DuckDB oracle: NFC (UAX#15 — identical output from any
    // compliant implementation), then strip the non-whitespace control
    // chars (TAB/LF/VT/FF/CR survive into the collapse step so "a\r\nb"
    // joins with a space, never as "ab"), then collapse \s+ runs (Java's
    // default \s == RE2's \s == [ \t\n\x0B\f\r]) and trim the single
    // leading/trailing space the collapse can leave.
    private static final java.util.regex.Pattern CTRL =
        java.util.regex.Pattern.compile("[\\x00-\\x08\\x0E-\\x1F\\x7F]");
    private static final java.util.regex.Pattern WS =
        java.util.regex.Pattern.compile("\\s+");

    public static UTF8String normalizeText(UTF8String s) {
        String nfc = java.text.Normalizer.normalize(
            s.toString(), java.text.Normalizer.Form.NFC);
        String collapsed = WS.matcher(CTRL.matcher(nfc).replaceAll(""))
            .replaceAll(" ");
        return UTF8String.fromString(collapsed.trim());
    }
}

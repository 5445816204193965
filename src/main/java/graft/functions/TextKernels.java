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
}

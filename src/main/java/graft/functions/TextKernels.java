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

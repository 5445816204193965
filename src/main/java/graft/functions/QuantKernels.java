package graft.functions;

/**
 * Scalar quantization kernels (SURVEY.md §2.8 F6-F8), static so Catalyst
 * whole-stage codegen can call them directly from generated Java.
 *
 * Formats (all round-to-nearest-even, standard public bit algorithms):
 *  - f16:  IEEE 754 binary16 (1-5-10) — reference: edge/f16_quantization.go
 *  - bf16: bfloat16, top 16 bits of binary32 (1-8-7) — the documented intent
 *          of edge/bf16_quantization.go (whose actual code is a mislabeled
 *          copy of the binary16 conversion — divergence recorded here)
 *  - f8:   minifloat 1-5-2, bias 15 — the layout the reference's float8
 *          masks intend (pkg/compresshelper/float8.go's decode shifts are
 *          broken: `(in & 0x7c) >> 10` is always 0 — we implement the format,
 *          not the bug)
 */
public final class QuantKernels {
    private QuantKernels() {}

    // ---- IEEE binary16 ----

    public static short floatToF16(float v) {
        int u = Float.floatToRawIntBits(v);
        int sign = (u >>> 16) & 0x8000;
        int exp = u & 0x7f800000;
        int coef = u & 0x007fffff;
        if (exp == 0x7f800000) { // NaN / Inf
            int nanBit = (coef != 0) ? 0x0200 : 0;
            return (short) (sign | 0x7c00 | nanBit | (coef >>> 13));
        }
        int halfExp = (exp >>> 23) - 127 + 15;
        if (halfExp >= 0x1f) return (short) (sign | 0x7c00); // overflow -> inf
        if (halfExp <= 0) { // subnormal / underflow
            if (14 - halfExp > 24) return (short) sign;
            int c = coef | 0x00800000;
            int halfCoef = c >>> (14 - halfExp);
            int roundBit = 1 << (13 - halfExp);
            if ((c & roundBit) != 0 && (c & (3 * roundBit - 1)) != 0) halfCoef++;
            return (short) (sign | halfCoef);
        }
        int halfCoef = coef >>> 13;
        int roundBit = 0x00001000;
        int r = sign | (halfExp << 10) | halfCoef;
        if ((coef & roundBit) != 0 && (coef & (3 * roundBit - 1)) != 0) r++;
        return (short) r;
    }

    /** Table-backed decode: a 64K-entry float table (256 KB, L2-resident)
     * replaces the branchy bit computation in the scan hot loop — the
     * 2-bytecode accessor inlines under ANY C2 inlining budget, where the
     * branchy form was observed to nondeterministically miss inlining and run
     * 3.5x slower for a whole JVM lifetime (PLANS.md, f16 fused kernel). */
    private static final float[] F16_TABLE = buildF16Table();

    private static float[] buildF16Table() {
        float[] t = new float[65536];
        for (int i = 0; i < 65536; i++) t[i] = f16ToFloatCompute((short) i);
        return t;
    }

    public static float f16ToFloat(short h) {
        return F16_TABLE[h & 0xffff];
    }

    static float f16ToFloatCompute(short h) {
        int in = h & 0xffff;
        int sign = (in & 0x8000) << 16;
        int exp = (in & 0x7c00) >>> 10;
        int coef = (in & 0x03ff) << 13;
        if (exp == 0x1f) {
            if (coef == 0) return Float.intBitsToFloat(sign | 0x7f800000);
            return Float.intBitsToFloat(sign | 0x7fc00000 | coef);
        }
        if (exp == 0) {
            if (coef == 0) return Float.intBitsToFloat(sign);
            exp++;
            while ((coef & 0x7f800000) == 0) { coef <<= 1; exp--; }
            coef &= 0x007fffff;
        }
        return Float.intBitsToFloat(sign | ((exp + 112) << 23) | coef);
    }

    // ---- bfloat16 ----

    public static short floatToBf16(float v) {
        int bits = Float.floatToRawIntBits(v);
        if ((bits & 0x7fffffff) > 0x7f800000) { // NaN: keep quiet bit set
            return (short) ((bits >>> 16) | 0x0040);
        }
        int lsb = (bits >>> 16) & 1;
        int rounded = bits + 0x7fff + lsb; // round-to-nearest-even on bit 16
        return (short) (rounded >>> 16);
    }

    public static float bf16ToFloat(short b) {
        return Float.intBitsToFloat((b & 0xffff) << 16);
    }

    // ---- minifloat 1-5-2 ("f8"), bias 15 ----

    public static byte floatToF8(float v) {
        int u = Float.floatToRawIntBits(v);
        int sign = (u >>> 24) & 0x80;
        int exp = u & 0x7f800000;
        int coef = u & 0x007fffff;
        if (exp == 0x7f800000) { // NaN / Inf
            return (byte) (sign | 0x7c | ((coef != 0) ? 0x01 : 0x00));
        }
        int e8 = (exp >>> 23) - 127 + 15;
        if (e8 >= 0x1f) return (byte) (sign | 0x7c); // overflow -> inf
        if (e8 <= 0) { // subnormal / underflow
            if (22 - e8 > 24) return (byte) sign;
            int c = coef | 0x00800000;
            int m = c >>> (22 - e8);
            int roundBit = 1 << (21 - e8);
            if ((c & roundBit) != 0 && (c & (3 * roundBit - 1)) != 0) m++;
            return (byte) (sign | m);
        }
        int m = coef >>> 21;
        int roundBit = 1 << 20;
        int r = sign | (e8 << 2) | m;
        if ((coef & roundBit) != 0 && (coef & (3 * roundBit - 1)) != 0) r++;
        return (byte) r;
    }

    private static final float[] F8_TABLE = buildF8Table();

    private static float[] buildF8Table() {
        float[] t = new float[256];
        for (int i = 0; i < 256; i++) t[i] = f8ToFloatCompute((byte) i);
        return t;
    }

    public static float f8ToFloat(byte b) {
        return F8_TABLE[b & 0xff];
    }

    static float f8ToFloatCompute(byte b) {
        int in = b & 0xff;
        int sign = (in & 0x80) << 24;
        int exp = (in & 0x7c) >>> 2;
        int coef = (in & 0x03) << 21;
        if (exp == 0x1f) {
            if (coef == 0) return Float.intBitsToFloat(sign | 0x7f800000);
            return Float.intBitsToFloat(sign | 0x7fc00000 | coef);
        }
        if (exp == 0) {
            if (coef == 0) return Float.intBitsToFloat(sign);
            exp++;
            while ((coef & 0x7f800000) == 0) { coef <<= 1; exp--; }
            coef &= 0x007fffff;
        }
        return Float.intBitsToFloat(sign | ((exp + 112) << 23) | coef);
    }
}

// One-shot generator for tests/fixtures/conformance/: encodes small
// deterministic images/audio with javax.imageio / javax.sound.sampled —
// an encoder implementation entirely independent of both the engine's
// from-spec Python decoders (wsspark/llmops/multimodal.py) and the
// test-side Python encoders (tests/test_multimodal.py), so decoder
// correctness stops depending on encoders that round 7 proved can be
// wrong (the progressive-JPEG ZRL bug).
//
// Run once:  java tools/GenConformance.java  (JDK 17 single-file launch)
// Outputs:   payload files + .src raw references + manifest.json
//
// References (all public): PNG spec (RFC 2083), BMP BITMAPINFOHEADER,
// GIF89a spec, JPEG ITU-T T.81, RIFF/WAVE. Expected pixels for lossy
// JPEG are ImageIO's OWN decode of the payload (independent-decoder
// reference), exact sources for the lossless formats.

import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.io.File;
import java.io.FileOutputStream;
import java.io.ByteArrayInputStream;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;
import javax.sound.sampled.AudioFileFormat;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;

public class GenConformance {
    static final String DIR = "tests/fixtures/conformance";
    static StringBuilder manifest = new StringBuilder("[\n");
    static boolean first = true;

    // deterministic "photo-ish" pattern: smooth gradients + a diagonal edge
    static int[] rgbAt(int x, int y, int w, int h) {
        int r = (x * 255) / Math.max(1, w - 1);
        int g = (y * 255) / Math.max(1, h - 1);
        int b = ((x + y) * 255) / Math.max(1, w + h - 2);
        if (x > y) { r = 255 - r; }
        return new int[] { r, g, b };
    }

    // smooth gradients only (no edges): chroma varies slowly, so the
    // decoder-vs-decoder JPEG comparison isn't dominated by which chroma
    // UPSAMPLING filter an implementation chose (triangle vs replicate —
    // both spec-legal, divergence is unbounded at sharp chroma edges).
    static BufferedImage makeSmoothRGB(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (x * 255) / Math.max(1, w - 1);
                int g = (y * 255) / Math.max(1, h - 1);
                int b = ((x + y) * 255) / Math.max(1, w + h - 2);
                img.setRGB(x, y, 0xFF000000 | (r << 16) | (g << 8) | b);
            }
        return img;
    }

    static BufferedImage makeRGB(int w, int h, int type) {
        BufferedImage img = new BufferedImage(w, h, type);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int[] p = rgbAt(x, y, w, h);
                int argb = 0xFF000000 | (p[0] << 16) | (p[1] << 8) | p[2];
                img.setRGB(x, y, argb);
            }
        return img;
    }

    static byte[] rawRGB(BufferedImage img) {
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h * 3];
        int i = 0;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int p = img.getRGB(x, y);
                out[i++] = (byte) ((p >> 16) & 0xFF);
                out[i++] = (byte) ((p >> 8) & 0xFF);
                out[i++] = (byte) (p & 0xFF);
            }
        return out;
    }

    static void write(String name, byte[] data) throws Exception {
        try (FileOutputStream f = new FileOutputStream(new File(DIR, name))) {
            f.write(data);
        }
    }

    static void entry(String file, String kind, int w, int h, String src,
                      int tol, String note) {
        if (!first) manifest.append(",\n");
        first = false;
        manifest.append(String.format(
            "  {\"file\": \"%s\", \"kind\": \"%s\", \"w\": %d, \"h\": %d," +
            " \"src\": \"%s\", \"tol\": %d, \"note\": \"%s\"}",
            file, kind, w, h, src, tol, note));
    }

    static void img(String name, String fmt, BufferedImage im, String note)
            throws Exception {
        File f = new File(DIR, name);
        ImageIO.write(im, fmt, f);
        byte[] src = rawRGB(im);
        write(name + ".src", src);
        entry(name, "pixel", im.getWidth(), im.getHeight(), name + ".src", 0, note);
    }

    static void jpeg(String name, BufferedImage im, boolean progressive,
                     boolean optimized, float quality, String note)
            throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter wr = it.next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(quality);
        p.setProgressiveMode(progressive ? ImageWriteParam.MODE_DEFAULT
                                         : ImageWriteParam.MODE_DISABLED);
        try {  // JPEGImageWriteParam specific
            p.getClass().getMethod("setOptimizeHuffmanTables", boolean.class)
                .invoke(p, optimized);
        } catch (Exception ignore) {}
        File f = new File(DIR, name);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(im, null, null), p);
        }
        wr.dispose();
        // expected = ImageIO's own decode of the bytes it just wrote:
        // an independent-decoder reference, not an encoder roundtrip.
        byte[] payload = java.nio.file.Files.readAllBytes(f.toPath());
        BufferedImage dec = ImageIO.read(new ByteArrayInputStream(payload));
        byte[] src = rawRGB(dec);
        write(name + ".src", src);
        // tol covers residual IDCT implementation differences between
        // ImageIO's (libjpeg-family) decoder and the from-spec Python
        // one. With libjpeg-parity fancy chroma upsampling in the Python
        // decoder the measured divergence on this corpus is max 2 /
        // mean 0.03; tol 4 leaves float-vs-fixed IDCT headroom while any
        // real decode bug (desync, wrong plane) is 50x over.
        entry(name, "pixel", im.getWidth(), im.getHeight(), name + ".src", 4, note);
    }

    public static void main(String[] args) throws Exception {
        new File(DIR).mkdirs();

        img("png_rgb_16x16.png", "png", makeRGB(16, 16, BufferedImage.TYPE_INT_RGB),
            "ImageIO PNG truecolor");
        img("png_rgba_16x16.png", "png", makeRGB(16, 16, BufferedImage.TYPE_INT_ARGB),
            "ImageIO PNG RGBA (decoder drops alpha)");
        img("png_rgb_7x5.png", "png", makeRGB(7, 5, BufferedImage.TYPE_INT_RGB),
            "odd dims");
        BufferedImage gray = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY);
        byte[] graySrc = new byte[16 * 16 * 3];
        for (int y = 0; y < 16; y++)
            for (int x = 0; x < 16; x++) {
                int v = (x * 16 + y) & 0xFF;
                gray.getRaster().setSample(x, y, 0, v);
                int o = (y * 16 + x) * 3;
                graySrc[o] = graySrc[o + 1] = graySrc[o + 2] = (byte) v;
            }
        // Gray samples go in via the RASTER (not setRGB — setRGB on
        // TYPE_BYTE_GRAY converts through linear gray space and changes the
        // stored byte), so .src is exactly the PNG's gray samples tripled.
        ImageIO.write(gray, "png", new File(DIR, "png_gray_16x16.png"));
        write("png_gray_16x16.png.src", graySrc);
        entry("png_gray_16x16.png", "pixel", 16, 16, "png_gray_16x16.png.src",
            0, "ImageIO PNG grayscale (raster samples)");
        img("bmp_rgb_16x16.bmp", "bmp", makeRGB(16, 16, BufferedImage.TYPE_3BYTE_BGR),
            "ImageIO BMP 24-bit BI_RGB bottom-up");
        img("bmp_rgb_5x3.bmp", "bmp", makeRGB(5, 3, BufferedImage.TYPE_3BYTE_BGR),
            "BMP row padding (5px rows pad to 16 bytes)");

        // GIF: explicit 4-color palette so quantization is a no-op => exact.
        byte[] rp = {0, (byte) 255, 0, (byte) 128};
        byte[] gp = {0, 0, (byte) 255, (byte) 128};
        byte[] bp = {0, 0, 0, (byte) 128};
        IndexColorModel icm = new IndexColorModel(2, 4, rp, gp, bp);
        BufferedImage gif = new BufferedImage(11, 9,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        for (int y = 0; y < 9; y++)
            for (int x = 0; x < 11; x++) {
                int ix = (x + y) % 4;
                gif.setRGB(x, y, 0xFF000000 | ((rp[ix] & 0xFF) << 16)
                    | ((gp[ix] & 0xFF) << 8) | (bp[ix] & 0xFF));
            }
        File gf = new File(DIR, "gif_4color_11x9.gif");
        ImageIO.write(gif, "gif", gf);
        write("gif_4color_11x9.gif.src", rawRGB(gif));
        entry("gif_4color_11x9.gif", "gif", 11, 9, "gif_4color_11x9.gif.src", 0,
            "ImageIO GIF, 4-color palette, LZW");

        jpeg("jpeg_baseline_16x16.jpg", makeSmoothRGB(16, 16),
            false, false, 0.9f, "ImageIO baseline, standard tables");
        jpeg("jpeg_baseline_opt_24x17.jpg", makeSmoothRGB(24, 17),
            false, true, 0.85f, "baseline, optimized Huffman, odd dims");
        jpeg("jpeg_progressive_16x16.jpg", makeSmoothRGB(16, 16),
            true, false, 0.9f, "ImageIO progressive scan script");
        jpeg("jpeg_progressive_24x17.jpg", makeSmoothRGB(24, 17),
            true, true, 0.85f, "progressive + optimized, odd dims");

        // WAV: 16-bit PCM mono+stereo, deterministic ramp/sine-ish samples.
        for (int ch = 1; ch <= 2; ch++) {
            int n = 200;
            byte[] pcm = new byte[n * 2 * ch];
            for (int i = 0; i < n; i++)
                for (int c = 0; c < ch; c++) {
                    short s = (short) (((i * 331 + c * 7919) % 65536) - 32768);
                    int o = (i * ch + c) * 2;
                    pcm[o] = (byte) (s & 0xFF);
                    pcm[o + 1] = (byte) ((s >> 8) & 0xFF);
                }
            AudioFormat fmt = new AudioFormat(8000f, 16, ch, true, false);
            AudioInputStream ais = new AudioInputStream(
                new ByteArrayInputStream(pcm), fmt, n);
            String name = "wav_pcm16_" + ch + "ch.wav";
            AudioSystem.write(ais, AudioFileFormat.Type.WAVE, new File(DIR, name));
            write(name + ".src", pcm);
            entry(name, "wav", ch, n, name + ".src", 0,
                "javax.sound PCM16 LE, " + ch + " channel(s), 8 kHz");
        }

        manifest.append("\n]\n");
        write("manifest.json", manifest.toString().getBytes("UTF-8"));
        System.out.println("wrote conformance corpus to " + DIR);
    }
}

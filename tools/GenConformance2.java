// Round-9 EXTENSION of the fixed-byte decoder conformance corpus
// (tests/fixtures/conformance). Covers the decoder families round 8 left
// certified only by the repo's own Python test encoders — the dependency
// class the round-7 progressive-JPEG ZRL bug proved fallible:
//   - Adam7-interlaced PNG, 16-bit grayscale PNG, palette PNG (ImageIO)
//   - PPM P6 (raw spec-level byte assembly)
//   - animated GIF exercising disposal methods (ImageIO sequence writer;
//     expected canvases computed from the GIF89a compositing DEFINITION
//     over the known source frames, using the bg color parsed from the
//     actual written bytes)
//   - IMA/DVI ADPCM WAV (clean-room encoder AND decoder below, written
//     from the published IMA step tables — expected samples are THIS
//     file's decode, so the Python decoder must agree with a second
//     independent from-spec implementation, bit for bit)
//   - AVI-MJPEG container (RIFF assembly from spec; frame payloads are
//     ImageIO JPEGs, expected rasters are ImageIO's own decode of them)
//
// Existing payloads are NOT touched: this writes new files plus
// manifest2.json, which the test harness merges with manifest.json.
//
// Run once:  java tools/GenConformance2.java   (JDK 17 single-file launch)

import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageTypeSpecifier;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.metadata.IIOMetadata;
import javax.imageio.metadata.IIOMetadataNode;
import javax.imageio.stream.ImageOutputStream;

public class GenConformance2 {
    static final String DIR = "tests/fixtures/conformance";
    static StringBuilder manifest = new StringBuilder("[\n");
    static boolean first = true;

    static void write(String name, byte[] data) throws Exception {
        try (FileOutputStream f = new FileOutputStream(new File(DIR, name))) {
            f.write(data);
        }
    }

    static void entry(String file, String kind, int w, int h, String src,
                      int tol, int frames, String note) {
        if (!first) manifest.append(",\n");
        first = false;
        manifest.append(String.format(
            "  {\"file\": \"%s\", \"kind\": \"%s\", \"w\": %d, \"h\": %d," +
            " \"src\": \"%s\", \"tol\": %d, \"frames\": %d, \"note\": \"%s\"}",
            file, kind, w, h, src, tol, frames, note));
    }

    static int[] rgbAt(int x, int y, int w, int h) {
        int r = (x * 255) / Math.max(1, w - 1);
        int g = (y * 255) / Math.max(1, h - 1);
        int b = ((x + y) * 255) / Math.max(1, w + h - 2);
        if (x > y) { r = 255 - r; }
        return new int[] { r, g, b };
    }

    static BufferedImage makeRGB(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int[] p = rgbAt(x, y, w, h);
                img.setRGB(x, y, 0xFF000000 | (p[0] << 16) | (p[1] << 8) | p[2]);
            }
        return img;
    }

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

    // ---------- PNG variants ----------

    static void pngInterlaced() throws Exception {
        BufferedImage im = makeRGB(16, 16);
        ImageWriter wr = ImageIO.getImageWritersByFormatName("png").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT); // Adam7
        File f = new File(DIR, "png_interlaced_16x16.png");
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(im, null, null), p);
        }
        wr.dispose();
        // sanity: interlace byte of IHDR must be 1
        byte[] b = java.nio.file.Files.readAllBytes(f.toPath());
        if (b[28] != 1) throw new IllegalStateException("PNG not interlaced");
        write("png_interlaced_16x16.png.src", rawRGB(im));
        entry("png_interlaced_16x16.png", "pixel", 16, 16,
              "png_interlaced_16x16.png.src", 0, 1,
              "ImageIO PNG, Adam7 interlaced truecolor");
    }

    static void pngGray16() throws Exception {
        int w = 13, h = 7;
        BufferedImage im = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY);
        byte[] src = new byte[w * h * 3];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = ((x * 5003 + y * 271 + 13) * 131) & 0xFFFF;
                im.getRaster().setSample(x, y, 0, v);
                int hi = v >> 8; // decoder reduces 16-bit to the high byte
                int o = (y * w + x) * 3;
                src[o] = src[o + 1] = src[o + 2] = (byte) hi;
            }
        File f = new File(DIR, "png_gray16_13x7.png");
        ImageIO.write(im, "png", f);
        byte[] b = java.nio.file.Files.readAllBytes(f.toPath());
        if (b[24] != 16) throw new IllegalStateException("PNG not 16-bit");
        write("png_gray16_13x7.png.src", src);
        entry("png_gray16_13x7.png", "pixel", w, h, "png_gray16_13x7.png.src",
              0, 1, "ImageIO PNG, 16-bit grayscale (high-byte reduction)");
    }

    static void pngPalette() throws Exception {
        int w = 10, h = 6;
        byte[] rp = {10, (byte) 200, 0, (byte) 255, 60, 0, (byte) 128, 30};
        byte[] gp = {20, 0, (byte) 210, (byte) 255, 60, 90, 0, (byte) 240};
        byte[] bp = {30, 40, 0, (byte) 255, (byte) 200, 90, (byte) 128, 15};
        IndexColorModel icm = new IndexColorModel(3, 8, rp, gp, bp);
        BufferedImage im = new BufferedImage(w, h,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        byte[] src = new byte[w * h * 3];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int ix = (x * 3 + y * 5) % 8;
                im.getRaster().setSample(x, y, 0, ix);
                int o = (y * w + x) * 3;
                src[o] = rp[ix]; src[o + 1] = gp[ix]; src[o + 2] = bp[ix];
            }
        ImageIO.write(im, "png", new File(DIR, "png_palette_10x6.png"));
        write("png_palette_10x6.png.src", src);
        entry("png_palette_10x6.png", "pixel", w, h, "png_palette_10x6.png.src",
              0, 1, "ImageIO PNG, color type 3 (palette)");
    }

    static void pngLowDepth() throws Exception {
        // 1-bit: TYPE_BYTE_BINARY default = black/white bilevel
        int w = 14, h = 9;
        BufferedImage bw = new BufferedImage(w, h,
            BufferedImage.TYPE_BYTE_BINARY);
        byte[] src1 = new byte[w * h * 3];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = ((x * 3 + y * y) % 5 < 2) ? 1 : 0;
                bw.getRaster().setSample(x, y, 0, v);
                int o = (y * w + x) * 3;
                byte b = (byte) (v == 1 ? 255 : 0);
                src1[o] = src1[o + 1] = src1[o + 2] = b;
            }
        ImageIO.write(bw, "png", new File(DIR, "png_1bit_14x9.png"));
        write("png_1bit_14x9.png.src", src1);
        entry("png_1bit_14x9.png", "pixel", w, h, "png_1bit_14x9.png.src",
              0, 1, "ImageIO PNG, 1-bit bilevel");

        // 4-bit palette: TYPE_BYTE_BINARY with a 16-color ICM
        byte[] rp = new byte[16], gp = new byte[16], bp = new byte[16];
        for (int i = 0; i < 16; i++) {
            rp[i] = (byte) (i * 17);
            gp[i] = (byte) (255 - i * 17);
            bp[i] = (byte) ((i * 53) & 0xFF);
        }
        IndexColorModel icm = new IndexColorModel(4, 16, rp, gp, bp);
        int w2 = 9, h2 = 6;
        BufferedImage p4 = new BufferedImage(w2, h2,
            BufferedImage.TYPE_BYTE_BINARY, icm);
        byte[] src4 = new byte[w2 * h2 * 3];
        for (int y = 0; y < h2; y++)
            for (int x = 0; x < w2; x++) {
                int ix = (x * 7 + y * 3) % 16;
                p4.getRaster().setSample(x, y, 0, ix);
                int o = (y * w2 + x) * 3;
                src4[o] = rp[ix]; src4[o + 1] = gp[ix]; src4[o + 2] = bp[ix];
            }
        ImageIO.write(p4, "png", new File(DIR, "png_4bit_pal_9x6.png"));
        write("png_4bit_pal_9x6.png.src", src4);
        entry("png_4bit_pal_9x6.png", "pixel", w2, h2,
              "png_4bit_pal_9x6.png.src", 0, 1,
              "ImageIO PNG, 4-bit palette");
    }

    static void jpegGray() throws Exception {
        int w = 17, h = 11;
        BufferedImage im = new BufferedImage(w, h,
            BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                im.getRaster().setSample(x, y, 0,
                    (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2);
        ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(0.9f);
        File f = new File(DIR, "jpeg_gray_17x11.jpg");
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(im, null, null), p);
        }
        wr.dispose();
        byte[] payload = java.nio.file.Files.readAllBytes(f.toPath());
        BufferedImage dec = ImageIO.read(new ByteArrayInputStream(payload));
        // read the decoded Y samples via the RASTER, tripled to RGB:
        // getRGB on a TYPE_BYTE_GRAY image converts linear gray -> sRGB
        // (gamma), but the JPEG's single component IS the Y sample the
        // decoder under test returns (same discipline as png_gray in
        // GenConformance.java)
        byte[] src = new byte[w * h * 3];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = dec.getRaster().getSample(x, y, 0);
                int o = (y * w + x) * 3;
                src[o] = src[o + 1] = src[o + 2] = (byte) v;
            }
        write("jpeg_gray_17x11.jpg.src", src);
        entry("jpeg_gray_17x11.jpg", "pixel", w, h, "jpeg_gray_17x11.jpg.src",
              4, 1, "ImageIO grayscale (1-component) JPEG, odd dims; "
              + "expected = ImageIO decode");
    }

    static void jpeg422() throws Exception {
        // 4:2:2 (h2v1) chroma subsampling via native-metadata sampling
        // factors (ImageIO honors them: default Y is 2x2; forcing
        // VsamplingFactor=1 yields SOF H=2 V=1) — certifies the decoder's
        // h2v1 fancy-upsampling branch against an independent encoder.
        int w = 18, h = 13;
        BufferedImage im = makeSmoothRGB(w, h);
        ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(0.9f);
        IIOMetadata md = wr.getDefaultImageMetadata(
            new ImageTypeSpecifier(im), p);
        String fmt = md.getNativeMetadataFormatName();
        IIOMetadataNode root = (IIOMetadataNode) md.getAsTree(fmt);
        org.w3c.dom.NodeList sofs = root.getElementsByTagName("sof");
        org.w3c.dom.NodeList comps = ((IIOMetadataNode) sofs.item(0))
            .getElementsByTagName("componentSpec");
        ((IIOMetadataNode) comps.item(0)).setAttribute("VsamplingFactor", "1");
        md.setFromTree(fmt, root);
        File f = new File(DIR, "jpeg_422_18x13.jpg");
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(im, null, md), p);
        }
        wr.dispose();
        byte[] b = java.nio.file.Files.readAllBytes(f.toPath());
        // sanity: SOF0 component 1 must carry H=2 V=1
        boolean ok = false;
        for (int i = 2; i + 4 < b.length; ) {
            if ((b[i] & 0xFF) != 0xFF) { i++; continue; }
            int m = b[i + 1] & 0xFF;
            int ln = ((b[i + 2] & 0xFF) << 8) | (b[i + 3] & 0xFF);
            if (m == 0xC0) {
                int hv = b[i + 11] & 0xFF;
                ok = (hv >> 4) == 2 && (hv & 15) == 1;
                break;
            }
            if (m == 0xDA) break;
            i += 2 + ln;
        }
        if (!ok) throw new IllegalStateException("JPEG not h2v1");
        BufferedImage dec = ImageIO.read(new ByteArrayInputStream(b));
        write("jpeg_422_18x13.jpg.src", rawRGB(dec));
        entry("jpeg_422_18x13.jpg", "pixel", w, h, "jpeg_422_18x13.jpg.src",
              4, 1, "ImageIO JPEG, 4:2:2 (h2v1) subsampling via metadata; "
              + "expected = ImageIO decode");
    }

    static void gifInterlaced() throws Exception {
        int w = 13, h = 10;
        byte[] rp = {5, (byte) 250, 30, (byte) 120};
        byte[] gp = {15, 10, (byte) 220, (byte) 120};
        byte[] bp = {25, 45, 5, (byte) 200};
        IndexColorModel icm = new IndexColorModel(2, 4, rp, gp, bp);
        BufferedImage im = new BufferedImage(w, h,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                im.getRaster().setSample(x, y, 0, (x * 2 + y) % 4);
        ImageWriter wr = ImageIO.getImageWritersByFormatName("gif").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        IIOMetadata md = wr.getDefaultImageMetadata(
            new ImageTypeSpecifier(im), p);
        String fmt = md.getNativeMetadataFormatName();
        IIOMetadataNode root = (IIOMetadataNode) md.getAsTree(fmt);
        IIOMetadataNode desc = childOrNew(root, "ImageDescriptor");
        desc.setAttribute("imageLeftPosition", "0");
        desc.setAttribute("imageTopPosition", "0");
        desc.setAttribute("imageWidth", Integer.toString(w));
        desc.setAttribute("imageHeight", Integer.toString(h));
        desc.setAttribute("interlaceFlag", "TRUE");
        md.setFromTree(fmt, root);
        File f = new File(DIR, "gif_interlaced_13x10.gif");
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(im, null, md), p);
        }
        wr.dispose();
        // sanity: the image descriptor's interlace bit must be set
        byte[] b = java.nio.file.Files.readAllBytes(f.toPath());
        boolean found = false;
        for (int i = 0; i < b.length - 9; i++)
            if ((b[i] & 0xFF) == 0x2C) {
                int fw = (b[i + 5] & 0xFF) | ((b[i + 6] & 0xFF) << 8);
                int fh = (b[i + 7] & 0xFF) | ((b[i + 8] & 0xFF) << 8);
                if (fw == w && fh == h) {
                    found = (b[i + 9] & 0x40) != 0;
                    break;
                }
            }
        if (!found) throw new IllegalStateException("GIF not interlaced");
        write("gif_interlaced_13x10.gif.src", rawRGB(im));
        entry("gif_interlaced_13x10.gif", "gif", w, h,
              "gif_interlaced_13x10.gif.src", 0, 1,
              "ImageIO GIF, 4-pass interlaced");
    }

    // ---------- PPM ----------

    static void ppm() throws Exception {
        int w = 9, h = 5;
        BufferedImage im = makeRGB(w, h);
        byte[] raster = rawRGB(im);
        ByteArrayOutputStream out = new ByteArrayOutputStream();
        out.write(("P6\n" + w + " " + h + "\n255\n").getBytes("US-ASCII"));
        out.write(raster);
        write("ppm_rgb_9x5.ppm", out.toByteArray());
        write("ppm_rgb_9x5.ppm.src", raster);
        entry("ppm_rgb_9x5.ppm", "pixel", w, h, "ppm_rgb_9x5.ppm.src", 0, 1,
              "raw P6 PPM, spec header + binary raster");
    }

    // ---------- animated GIF with disposal methods ----------

    static IIOMetadata gifFrameMeta(ImageWriter wr, ImageWriteParam p,
            BufferedImage im, String disposal, int delayCs, int left, int top)
            throws Exception {
        IIOMetadata md = wr.getDefaultImageMetadata(
            new ImageTypeSpecifier(im), p);
        String fmt = md.getNativeMetadataFormatName();
        IIOMetadataNode root = (IIOMetadataNode) md.getAsTree(fmt);
        IIOMetadataNode gce = childOrNew(root, "GraphicControlExtension");
        gce.setAttribute("disposalMethod", disposal);
        gce.setAttribute("userInputFlag", "FALSE");
        gce.setAttribute("transparentColorFlag", "FALSE");
        gce.setAttribute("delayTime", Integer.toString(delayCs));
        gce.setAttribute("transparentColorIndex", "0");
        IIOMetadataNode desc = childOrNew(root, "ImageDescriptor");
        desc.setAttribute("imageLeftPosition", Integer.toString(left));
        desc.setAttribute("imageTopPosition", Integer.toString(top));
        desc.setAttribute("imageWidth", Integer.toString(im.getWidth()));
        desc.setAttribute("imageHeight", Integer.toString(im.getHeight()));
        desc.setAttribute("interlaceFlag", "FALSE");
        md.setFromTree(fmt, root);
        return md;
    }

    static IIOMetadataNode childOrNew(IIOMetadataNode root, String name) {
        for (int i = 0; i < root.getLength(); i++)
            if (root.item(i).getNodeName().equals(name))
                return (IIOMetadataNode) root.item(i);
        IIOMetadataNode n = new IIOMetadataNode(name);
        root.appendChild(n);
        return n;
    }

    static void gifAnimated() throws Exception {
        int W = 11, H = 7;
        byte[] rp = {0, (byte) 255, 0, (byte) 128};
        byte[] gp = {0, 0, (byte) 255, (byte) 128};
        byte[] bp = {40, 0, 0, (byte) 128};
        IndexColorModel icm = new IndexColorModel(2, 4, rp, gp, bp);

        // frame 1: full canvas; frame 2: 5x3 sub-rect at (3,2) disposal
        // restore-to-background; frame 3: 4x2 sub-rect at (0,4)
        BufferedImage f1 = new BufferedImage(W, H,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++)
                f1.getRaster().setSample(x, y, 0, (x + y) % 4);
        BufferedImage f2 = new BufferedImage(5, 3,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        for (int y = 0; y < 3; y++)
            for (int x = 0; x < 5; x++)
                f2.getRaster().setSample(x, y, 0, (x * y + 1) % 4);
        BufferedImage f3 = new BufferedImage(4, 2,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        for (int y = 0; y < 2; y++)
            for (int x = 0; x < 4; x++)
                f3.getRaster().setSample(x, y, 0, (x + 2 * y) % 4);

        ImageWriter wr = ImageIO.getImageWritersByFormatName("gif").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        File f = new File(DIR, "gif_anim_disposal_11x7.gif");
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            wr.setOutput(os);
            wr.prepareWriteSequence(wr.getDefaultStreamMetadata(p));
            wr.writeToSequence(new IIOImage(f1, null,
                gifFrameMeta(wr, p, f1, "doNotDispose", 10, 0, 0)), p);
            wr.writeToSequence(new IIOImage(f2, null,
                gifFrameMeta(wr, p, f2, "restoreToBackgroundColor", 20, 3, 2)), p);
            wr.writeToSequence(new IIOImage(f3, null,
                gifFrameMeta(wr, p, f3, "none", 30, 0, 4)), p);
            wr.endWriteSequence();
        }
        wr.dispose();

        // Expected canvases from the GIF89a compositing DEFINITION over the
        // known source frames. Background color comes from the bytes
        // actually written (logical screen descriptor + global color
        // table) — NOT from any decoder.
        byte[] b = java.nio.file.Files.readAllBytes(f.toPath());
        int lsdFlags = b[10] & 0xFF;
        if ((lsdFlags & 0x80) == 0)
            throw new IllegalStateException("writer emitted no global color "
                + "table; bg-restore semantics would be ambiguous");
        int gctSize = 2 << (lsdFlags & 7);
        int bgIndex = b[11] & 0xFF;
        byte[] bg = new byte[3];
        System.arraycopy(b, 13 + 3 * bgIndex, bg, 0, 3);

        byte[] canvas = new byte[W * H * 3];
        for (int i = 0; i < canvas.length; i += 3)
            System.arraycopy(bg, 0, canvas, i, 3);
        ByteArrayOutputStream srcAll = new ByteArrayOutputStream();
        // frame 1 at (0,0), full canvas, then doNotDispose
        blit(canvas, W, rawRGB(f1), 0, 0, W, H);
        srcAll.write(canvas.clone());
        // frame 2 at (3,2), then restore its rect to background
        blit(canvas, W, rawRGB(f2), 3, 2, 5, 3);
        srcAll.write(canvas.clone());
        fillRect(canvas, W, bg, 3, 2, 5, 3);
        // frame 3 at (0,4), disposal none
        blit(canvas, W, rawRGB(f3), 0, 4, 4, 2);
        srcAll.write(canvas.clone());

        write("gif_anim_disposal_11x7.gif.src", srcAll.toByteArray());
        entry("gif_anim_disposal_11x7.gif", "gif_anim", W, H,
              "gif_anim_disposal_11x7.gif.src", 0, 3,
              "ImageIO animated GIF: sub-rect frames, doNotDispose + "
              + "restoreToBackgroundColor disposal");
    }

    static void blit(byte[] canvas, int W, byte[] rgb, int fx, int fy,
                     int fw, int fh) {
        for (int y = 0; y < fh; y++)
            for (int x = 0; x < fw; x++)
                System.arraycopy(rgb, (y * fw + x) * 3, canvas,
                    ((fy + y) * W + fx + x) * 3, 3);
    }

    static void fillRect(byte[] canvas, int W, byte[] c, int fx, int fy,
                         int fw, int fh) {
        for (int y = 0; y < fh; y++)
            for (int x = 0; x < fw; x++)
                System.arraycopy(c, 0, canvas, ((fy + y) * W + fx + x) * 3, 3);
    }

    // ---------- IMA/DVI ADPCM WAV: clean-room encoder + decoder ----------

    static final int[] IMA_INDEX = {-1, -1, -1, -1, 2, 4, 6, 8};
    static final int[] IMA_STEPS = {
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767};

    static int clamp16(int v) {
        return v < -32768 ? -32768 : (v > 32767 ? 32767 : v);
    }

    /** Encode one sample against (pred, idx) state; returns nibble and
     *  mutates state via the standard decoder update. */
    static int imaEncodeStep(int sample, int[] state) {
        int step = IMA_STEPS[state[1]];
        int diff = sample - state[0];
        int nib = 0;
        if (diff < 0) { nib = 8; diff = -diff; }
        if (diff >= step) { nib |= 4; diff -= step; }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1; }
        if (diff >= (step >> 2)) { nib |= 1; }
        imaDecodeStep(nib, state);
        return nib;
    }

    /** The published IMA decode update: reconstruct and advance state. */
    static int imaDecodeStep(int nib, int[] state) {
        int step = IMA_STEPS[state[1]];
        int diff = step >> 3;
        if ((nib & 1) != 0) diff += step >> 2;
        if ((nib & 2) != 0) diff += step >> 1;
        if ((nib & 4) != 0) diff += step;
        int p = state[0] + (((nib & 8) != 0) ? -diff : diff);
        state[0] = clamp16(p);
        int ix = state[1] + IMA_INDEX[nib & 7];
        state[1] = ix < 0 ? 0 : (ix > 88 ? 88 : ix);
        return state[0];
    }

    static void wavAdpcm(int nCh) throws Exception {
        int blockAlign = 16 * nCh;                  // (16c-4c)*2/c = 24 nibbles
        int samplesPerBlock = 1 + (blockAlign - 4 * nCh) * 2 / nCh;  // 25
        int nBlocks = 4;
        int n = nBlocks * samplesPerBlock;          // per channel
        // deterministic band-limited-ish input ADPCM can track
        short[][] pcmIn = new short[nCh][n];
        for (int c = 0; c < nCh; c++)
            for (int i = 0; i < n; i++) {
                double t = i * (0.21 + 0.07 * c) + c * 1.3;
                pcmIn[c][i] = (short) (9000 * Math.sin(t)
                    + 3000 * Math.sin(2.9 * t + 0.5));
            }

        int[][] state = new int[nCh][2];            // pred, idx; carried
        ByteArrayOutputStream data = new ByteArrayOutputStream();
        for (int blk = 0; blk < nBlocks; blk++) {
            int s0 = blk * samplesPerBlock;
            for (int c = 0; c < nCh; c++) {
                state[c][0] = pcmIn[c][s0];         // header = first sample
                data.write(state[c][0] & 0xFF);
                data.write((state[c][0] >> 8) & 0xFF);
                data.write(state[c][1]);
                data.write(0);
            }
            int[][] nibs = new int[nCh][samplesPerBlock - 1];
            for (int c = 0; c < nCh; c++)
                for (int i = 1; i < samplesPerBlock; i++)
                    nibs[c][i - 1] = imaEncodeStep(pcmIn[c][s0 + i], state[c]);
            // interleave: 4-byte (8-nibble) groups per channel, low first
            for (int g = 0; g < (samplesPerBlock - 1) / 8; g++)
                for (int c = 0; c < nCh; c++)
                    for (int k = 0; k < 4; k++) {
                        int lo = nibs[c][g * 8 + 2 * k];
                        int hi = nibs[c][g * 8 + 2 * k + 1];
                        data.write(lo | (hi << 4));
                    }
        }
        byte[] adpcm = data.toByteArray();
        if (adpcm.length != nBlocks * blockAlign)
            throw new IllegalStateException("bad block assembly");

        // independent decode pass (fresh state per block, as the format
        // defines) -> the expected PCM
        ByteArrayOutputStream pcmOut = new ByteArrayOutputStream();
        for (int blk = 0; blk < nBlocks; blk++) {
            int base = blk * blockAlign;
            int[][] st = new int[nCh][2];
            int[][] chans = new int[nCh][samplesPerBlock];
            for (int c = 0; c < nCh; c++) {
                st[c][0] = (short) ((adpcm[base + 4 * c] & 0xFF)
                    | (adpcm[base + 4 * c + 1] << 8));
                st[c][1] = adpcm[base + 4 * c + 2] & 0xFF;
                chans[c][0] = st[c][0];
            }
            int pos = 4 * nCh;
            int[] got = new int[nCh];
            while (pos < blockAlign) {
                for (int c = 0; c < nCh; c++)
                    for (int k = 0; k < 4; k++) {
                        int byt = adpcm[base + pos + 4 * c + k] & 0xFF;
                        chans[c][1 + got[c]++] = imaDecodeStep(byt & 0xF, st[c]);
                        chans[c][1 + got[c]++] = imaDecodeStep(byt >> 4, st[c]);
                    }
                pos += 4 * nCh;
            }
            for (int i = 0; i < samplesPerBlock; i++)
                for (int c = 0; c < nCh; c++) {
                    pcmOut.write(chans[c][i] & 0xFF);
                    pcmOut.write((chans[c][i] >> 8) & 0xFF);
                }
        }

        // RIFF/WAVE container: fmt (0x11, cbSize=2, samplesPerBlock) +
        // fact + data
        ByteArrayOutputStream wav = new ByteArrayOutputStream();
        int byteRate = 8000 * blockAlign / samplesPerBlock;
        byte[] fmt = le(new int[][] {{0x11, 2}, {nCh, 2}, {8000, 4},
            {byteRate, 4}, {blockAlign, 2}, {4, 2}, {2, 2},
            {samplesPerBlock, 2}});
        byte[] fact = le(new int[][] {{n, 4}});
        int riffLen = 4 + (8 + fmt.length) + (8 + fact.length)
            + (8 + adpcm.length);
        wav.write("RIFF".getBytes("US-ASCII"));
        wav.write(le4(riffLen));
        wav.write("WAVE".getBytes("US-ASCII"));
        wav.write("fmt ".getBytes("US-ASCII"));
        wav.write(le4(fmt.length));
        wav.write(fmt);
        wav.write("fact".getBytes("US-ASCII"));
        wav.write(le4(fact.length));
        wav.write(fact);
        wav.write("data".getBytes("US-ASCII"));
        wav.write(le4(adpcm.length));
        wav.write(adpcm);

        String name = "wav_ima_adpcm_" + nCh + "ch.wav";
        write(name, wav.toByteArray());
        write(name + ".src", pcmOut.toByteArray());
        entry(name, "wav", nCh, n, name + ".src", 0, 1,
              "IMA/DVI ADPCM, " + nCh + " ch, 8 kHz, clean-room Java "
              + "encoder; expected = independent Java from-spec decode");
    }

    static byte[] le4(int v) {
        return new byte[] {(byte) v, (byte) (v >> 8), (byte) (v >> 16),
                           (byte) (v >> 24)};
    }

    static byte[] le(int[][] fields) {
        ByteArrayOutputStream o = new ByteArrayOutputStream();
        for (int[] f : fields)
            for (int i = 0; i < f[1]; i++)
                o.write((f[0] >> (8 * i)) & 0xFF);
        return o.toByteArray();
    }

    // ---------- AVI-MJPEG container ----------

    static byte[] chunk(String fourcc, byte[] body) throws Exception {
        ByteArrayOutputStream o = new ByteArrayOutputStream();
        o.write(fourcc.getBytes("US-ASCII"));
        o.write(le4(body.length));
        o.write(body);
        if ((body.length & 1) == 1) o.write(0);
        return o.toByteArray();
    }

    static byte[] list(String type, byte[]... chunks) throws Exception {
        ByteArrayOutputStream body = new ByteArrayOutputStream();
        body.write(type.getBytes("US-ASCII"));
        for (byte[] c : chunks) body.write(c);
        byte[] b = body.toByteArray();
        ByteArrayOutputStream o = new ByteArrayOutputStream();
        o.write("LIST".getBytes("US-ASCII"));
        o.write(le4(b.length));
        o.write(b);
        if ((b.length & 1) == 1) o.write(0);
        return o.toByteArray();
    }

    static byte[] jpegBytes(BufferedImage im, float q) throws Exception {
        ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        ByteArrayOutputStream bo = new ByteArrayOutputStream();
        try (ImageOutputStream os = ImageIO.createImageOutputStream(bo)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(im, null, null), p);
        }
        wr.dispose();
        return bo.toByteArray();
    }

    static void aviMjpeg() throws Exception {
        int W = 16, H = 16, usPerFrame = 40000;
        BufferedImage[] srcs = {makeSmoothRGB(W, H), makeSmoothRGB(W, H)};
        // second frame: shifted gradient so frames differ
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                int p = srcs[1].getRGB(x, y);
                srcs[1].setRGB(x, y, 0xFF000000 | (~p & 0x00FFFFFF));
            }
        byte[][] jpgs = {jpegBytes(srcs[0], 0.9f), jpegBytes(srcs[1], 0.9f)};

        // avih: usPerFrame, maxBytesPerSec, padding, flags, totalFrames,
        // initialFrames, streams, bufSize, width, height (+4 reserved)
        byte[] avih = le(new int[][] {{usPerFrame, 4}, {0, 4}, {0, 4},
            {0, 4}, {2, 4}, {0, 4}, {1, 4}, {0, 4}, {W, 4}, {H, 4},
            {0, 4}, {0, 4}, {0, 4}, {0, 4}});
        ByteArrayOutputStream strhB = new ByteArrayOutputStream();
        strhB.write("vids".getBytes("US-ASCII"));
        strhB.write("MJPG".getBytes("US-ASCII"));
        strhB.write(le(new int[][] {{0, 4}, {0, 2}, {0, 2}, {0, 4},
            {1, 4}, {25, 4}, {0, 4}, {2, 4}, {0, 4}, {0, 4}, {0, 4},
            {0, 2}, {0, 2}, {W, 2}, {H, 2}}));
        // strf = BITMAPINFOHEADER with biCompression 'MJPG' at offset 16
        ByteArrayOutputStream strfB = new ByteArrayOutputStream();
        strfB.write(le(new int[][] {{40, 4}, {W, 4}, {H, 4}, {1, 2},
            {24, 2}}));
        strfB.write("MJPG".getBytes("US-ASCII"));
        strfB.write(le(new int[][] {{W * H * 3, 4}, {0, 4}, {0, 4},
            {0, 4}, {0, 4}}));

        byte[] hdrl = list("hdrl", chunk("avih", avih),
            list("strl", chunk("strh", strhB.toByteArray()),
                 chunk("strf", strfB.toByteArray())));
        byte[] movi = list("movi", chunk("00dc", jpgs[0]),
            chunk("00dc", jpgs[1]));

        ByteArrayOutputStream body = new ByteArrayOutputStream();
        body.write("AVI ".getBytes("US-ASCII"));
        body.write(hdrl);
        body.write(movi);
        byte[] b = body.toByteArray();
        ByteArrayOutputStream avi = new ByteArrayOutputStream();
        avi.write("RIFF".getBytes("US-ASCII"));
        avi.write(le4(b.length));
        avi.write(b);

        write("avi_mjpg_2f_16x16.avi", avi.toByteArray());
        // expected = ImageIO's own decode of each embedded JPEG
        ByteArrayOutputStream src = new ByteArrayOutputStream();
        for (byte[] j : jpgs)
            src.write(rawRGB(ImageIO.read(new ByteArrayInputStream(j))));
        write("avi_mjpg_2f_16x16.avi.src", src.toByteArray());
        entry("avi_mjpg_2f_16x16.avi", "avi", W, H,
              "avi_mjpg_2f_16x16.avi.src", 4, 2,
              "spec-assembled RIFF AVI, MJPG vids stream, 2 ImageIO JPEG "
              + "frames; expected = ImageIO decode per frame");
    }

    public static void main(String[] args) throws Exception {
        new File(DIR).mkdirs();
        pngInterlaced();
        pngGray16();
        pngPalette();
        pngLowDepth();
        jpegGray();
        jpeg422();
        gifInterlaced();
        ppm();
        gifAnimated();
        wavAdpcm(1);
        wavAdpcm(2);
        aviMjpeg();
        manifest.append("\n]\n");
        write("manifest2.json", manifest.toString().getBytes("UTF-8"));
        System.out.println("wrote round-9 conformance extension to " + DIR);
    }
}

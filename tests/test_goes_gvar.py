"""GOES GVAR: PN derand involution, deframer, and the imager assembly on
synthetic frames (mirrors plugins/goes_support/goes/gvar/ in reverse)."""

import numpy as np

from satdump_tpu.models import goes_gvar as gv
from satdump_tpu.ops.fec.differential import nrzs_encode


def pack_words10(words: np.ndarray) -> np.ndarray:
    bits = ((np.asarray(words, np.uint16)[:, None]
             >> np.arange(9, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1))


def mk_linedoc(sc_id: int, counter: int, word_count: int) -> np.ndarray:
    w = np.zeros(16, np.uint16)
    w[0] = sc_id
    w[5], w[6] = counter >> 10, counter & 0x3FF
    w[11], w[12] = word_count >> 10, word_count & 0x3FF
    return w


def mk_frame(block_id: int, words_after_98: np.ndarray) -> np.ndarray:
    frame = np.zeros(gv.FRAME_BYTES, np.uint8)
    frame[0:8] = np.frombuffer(gv.ASM_SYNC.to_bytes(8, "big"), np.uint8)
    hdr = np.zeros(30, np.uint8)
    hdr[0] = block_id
    for off in (8, 38, 68):
        frame[off: off + 30] = hdr
    packed = pack_words10(words_after_98)
    frame[98: 98 + len(packed)] = packed[: gv.FRAME_BYTES - 98]
    return frame


def mk_ir_frame(rng, block_id: int, counter: int, lines4: np.ndarray,
                word_cnt: int = 5240) -> np.ndarray:
    words = np.zeros(16 + word_cnt * 3 + gv.IR_WIDTH, np.uint16)
    words[:16] = mk_linedoc(13, counter, word_cnt)
    for k in range(4):
        words[16 + word_cnt * k: 16 + word_cnt * k + gv.IR_WIDTH] = lines4[k]
    return mk_frame(block_id, words)


def mk_vis_frame(rng, block_id: int, counter: int, pixels: np.ndarray
                 ) -> np.ndarray:
    frame = mk_frame(block_id, mk_linedoc(13, counter, 6530))
    # pixel words start at byte 116, bit offset 6; pixel i = word i+1
    nwords = gv.VIS_WIDTH + 2
    words = np.zeros(nwords, np.uint16)
    words[1: 1 + gv.VIS_WIDTH] = pixels
    bits = ((words[:, None] >> np.arange(9, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
    full = np.concatenate([np.unpackbits(frame[116:118])[:6], bits])
    packed = np.packbits(full)
    frame[116: 116 + len(packed)] = packed[: gv.FRAME_BYTES - 116]
    return frame


def test_derand_involution(rng):
    frame = rng.integers(0, 256, gv.FRAME_BYTES).astype(np.uint8)
    rnd = gv.rand_frame_tx(frame)
    assert not np.array_equal(rnd[8:100], frame[8:100])
    assert np.array_equal(gv.derand_frame(rnd), frame)
    assert np.array_equal(rnd[:8], frame[:8])    # sync untouched


def test_gvar_decoder_deframe(tmp_path, rng):
    frames = [mk_ir_frame(rng, 1, i,
                          rng.integers(0, 1024, (4, gv.IR_WIDTH)))
              for i in range(2)]
    tx = np.concatenate([np.unpackbits(gv.rand_frame_tx(f))[:gv.FRAME_BITS]
                         for f in frames])
    tx = np.concatenate([rng.integers(0, 2, 97).astype(np.uint8), tx])
    enc, _ = nrzs_encode(tx)
    soft = np.where(enc > 0, 90, -90).astype(np.int8)
    p = tmp_path / "g.soft"
    soft.tofile(p)
    mod = gv.GVARDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["frame_count"] == 2
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(2, gv.FRAME_BYTES)
    # NRZ-S decode of the head is ambiguous by one bit; frames themselves
    # must be exact after the sync
    for g, f in zip(got, frames):
        assert np.array_equal(g[:-1], f[:-1])


def test_gvar_image_assembly(tmp_path, rng):
    ir_lines = rng.integers(0, 1024, (4, gv.IR_WIDTH)).astype(np.uint16)
    vis_pixels = rng.integers(0, 1024, (8, gv.VIS_WIDTH)).astype(np.uint16)
    counter = 5
    frames = [mk_ir_frame(rng, 1, counter, ir_lines)]
    for b in range(3, 11):
        frames.append(mk_vis_frame(rng, b, counter, vis_pixels[b - 3]))
    p = tmp_path / "g.gvar"
    np.concatenate(frames).tofile(p)
    mod = gv.GVARImageDecoderModule(str(p), str(tmp_path / "out" / "x"), {})
    mod.process()
    assert mod.stats["imagery_frames"] == 9
    assert mod.stats["satellite"] == 13
    from satdump_tpu.products.product import load_product
    prod = load_product(str(tmp_path / "out" / "IMAGER"))
    vis = prod.images[0].image
    assert vis.shape == (counter * 8 + 8, gv.VIS_WIDTH)
    for k in range(8):
        assert np.array_equal(vis[counter * 8 + k] >> 6, vis_pixels[k])
    ir_ch2 = prod.images[1].image                  # IR reader 1, image 1
    assert np.array_equal(ir_ch2[counter * 2] >> 6, ir_lines[0])
    assert np.array_equal(ir_ch2[counter * 2 + 1] >> 6, ir_lines[1])
    ir_ch3 = prod.images[2].image
    assert np.array_equal(ir_ch3[counter * 2] >> 6, ir_lines[2])
    assert np.array_equal(ir_ch3[counter * 2 + 1] >> 6, ir_lines[3])

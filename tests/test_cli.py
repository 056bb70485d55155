"""CLI end-to-end (C17): verify modes + file encode/delete-half/recover."""

import hashlib
import pathlib
import random

import numpy as np
import pytest

from fastecc_tpu.cli import main


def test_verify_and_roundtrip(capsys):
    assert main(["verify", "--lg-n", "6"]) == 0
    assert main(["--field", "gf16", "verify", "--lg-n", "6"]) == 0
    assert main(["roundtrip", "--lg-n", "10"]) == 0
    out = capsys.readouterr().out
    assert out.count("PASS") == 3


def test_file_encode_recover(tmp_path):
    src = tmp_path / "sample.bin"
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 256, size=50000, dtype=np.uint16).astype(
        np.uint8).tobytes()
    src.write_bytes(payload)
    coded = tmp_path / "coded"
    assert main(["encode", str(src), "-o", str(coded)]) == 0

    blocks = sorted(coded.glob("block_*"))
    random.seed(11)
    for victim in random.sample(blocks, len(blocks) // 2):
        victim.unlink()

    out = tmp_path / "recovered.bin"
    assert main(["recover", str(coded), "-o", str(out)]) == 0
    assert hashlib.sha256(out.read_bytes()).hexdigest() == \
        hashlib.sha256(payload).hexdigest()


def test_recover_insufficient(tmp_path):
    src = tmp_path / "s.bin"
    src.write_bytes(b"\x55" * 9000)
    coded = tmp_path / "coded"
    main(["encode", str(src), "-o", str(coded)])
    blocks = sorted(coded.glob("block_*"))
    # keep fewer than k block files
    manifest_k = 4  # 9000 bytes -> 3 blocks -> k=4
    for victim in blocks[: len(blocks) - (manifest_k - 1)]:
        victim.unlink()
    with pytest.raises(AssertionError, match="unrecoverable"):
        main(["recover", str(coded), "-o", str(tmp_path / "r.bin")])


def test_file_encode_recover_custom_block_size(tmp_path):
    """--block-bytes flows through manifest -> recover (reference SIZE arg)."""
    from fastecc_tpu import cli
    src = tmp_path / "input.bin"
    rng = np.random.default_rng(9)
    src.write_bytes(rng.integers(0, 256, 3000, dtype=np.uint16)
                    .astype(np.uint8).tobytes())
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out),
                     "--block-bytes", "512"]) == 0
    # delete two blocks (k=8 at 512B: 3000 -> 6 blocks -> k=8, n=16)
    victims = sorted(out.glob("block_*"))[:2]
    for v in victims:
        v.unlink()
    dst = tmp_path / "restored.bin"
    assert cli.main(["recover", str(out), "-o", str(dst)]) == 0
    assert dst.read_bytes() == src.read_bytes()

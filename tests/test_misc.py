"""CLIP text branch, CLIP BPE tokenizer, profiling helpers."""

import gzip

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.models.clap.clip_text import ClipTextConfig, ClipTextTransformer
from open_musiclm_tpu.models.clap.clip_tokenizer import ClipTokenizer
from open_musiclm_tpu.profiling import StepTimer, annotate


def test_clip_text_transformer():
    cfg = ClipTextConfig(context_length=16, vocab_size=64, width=32, heads=2, layers=2)
    model = ClipTextTransformer(cfg=cfg, joint_embed_shape=24)
    ids = jnp.array([[62, 5, 6, 63, 0, 0], [62, 7, 8, 9, 10, 63]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 24)
    # causality: padding after EOT must not change the output
    ids2 = ids.at[0, 4].set(3)
    out2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-5)


def test_clip_tokenizer(tmp_path):
    # minimal merge list: merges for 'he', 'll', 'o</w>'
    merges = "#version: 0.2\nh e\nl l\no </w>\nhe ll\n"
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write(merges)
    tok = ClipTokenizer(str(path), context_length=8)
    out = tok(["Hello", "hello hello"])
    assert out.shape == (2, 8)
    assert out[0, 0] == tok.sot
    # ends with eot then zero padding
    row = list(out[0])
    assert tok.eot in row
    assert row[row.index(tok.eot) + 1 :] == [0] * (7 - row.index(tok.eot))
    # lowercasing: same ids for both casings
    out2 = tok(["hello"])
    np.testing.assert_array_equal(out[0], out2[0])


def test_step_timer(tmp_path):
    p = tmp_path / "timing.jsonl"
    t = StepTimer(str(p))
    for i in range(3):
        with t:
            sum(range(1000))
        t.log(i, loss=1.0)
    assert t.avg_s is not None and t.avg_s > 0
    assert len(p.read_text().strip().split("\n")) == 3


def test_annotate_context():
    with annotate("test-region"):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8.0

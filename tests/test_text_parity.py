"""CLIPTextEncoder logits parity vs transformers' torch CLIPTextModel.

Random-init tiny torch towers (no network), converted with
tools/convert_weights.convert_clip_text_hf, must reproduce:
  * SD1.5 semantics: last_hidden_state (ln_final applied) + EOT pooling
  * SDXL semantics: RAW penultimate hidden (output_layer=-2, no ln_final)
  * projection towers: text_projection on the pooled EOT token
This is the offline proof that the conversion + module math match the
reference's conditioning stack (run_aug/run_aug.py from_pretrained towers).
"""

import jax.numpy as jnp
import numpy as np

from saspa_tpu.models.text_encoder import CLIPTextConfig as OurCfg
from saspa_tpu.models.text_encoder import CLIPTextEncoder
from tools.convert_weights import convert_clip_text_hf

WIDTH, LAYERS, HEADS, VOCAB, CTX = 32, 3, 4, 99, 12
EOS = VOCAB - 1  # max token id, so argmax-over-ids pooling finds it


def _torch_tiny(act: str, with_projection: bool = False):
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel, CLIPTextModelWithProjection

    cfg = HFCfg(
        vocab_size=VOCAB, hidden_size=WIDTH, intermediate_size=4 * WIDTH,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=CTX, hidden_act=act,
        eos_token_id=EOS, bos_token_id=EOS - 1, pad_token_id=0,
        projection_dim=16,
    )
    torch.manual_seed(0)
    cls = CLIPTextModelWithProjection if with_projection else CLIPTextModel
    return cls(cfg).eval()


def _ids():
    rng = np.random.RandomState(3)
    ids = rng.randint(1, EOS - 1, (2, CTX)).astype(np.int32)
    ids[0, 5] = EOS  # EOT mid-sequence exercises the pooling index
    ids[1, CTX - 1] = EOS
    return ids


def _convert(tm):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd = {k: v for k, v in sd.items() if "position_ids" not in k}
    return convert_clip_text_hf(sd, LAYERS)


def test_sd15_style_last_hidden_and_pooled():
    import torch

    tm = _torch_tiny("quick_gelu")
    params = _convert(tm)
    ours = CLIPTextEncoder(OurCfg(
        vocab_size=VOCAB, width=WIDTH, layers=LAYERS, heads=HEADS,
        context_length=CTX, act="quick_gelu", output_layer=-1,
    ))
    ids = _ids()
    out = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = tm(input_ids=torch.as_tensor(ids.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out["hidden"]), ref.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), ref.pooler_output.numpy(), rtol=2e-4, atol=2e-4
    )


def test_sdxl_style_raw_penultimate():
    import torch

    tm = _torch_tiny("gelu")
    params = _convert(tm)
    ours = CLIPTextEncoder(OurCfg(
        vocab_size=VOCAB, width=WIDTH, layers=LAYERS, heads=HEADS,
        context_length=CTX, act="gelu", output_layer=-2,
    ))
    ids = _ids()
    out = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = tm(input_ids=torch.as_tensor(ids.astype(np.int64)), output_hidden_states=True)
    # diffusers SDXL reads hidden_states[-2]: the raw input to the last block.
    # Slightly looser tolerance: the raw (un-normalized) hidden accumulates
    # f32 ordering noise across layers (oneDNN vs XLA reduction order).
    np.testing.assert_allclose(
        np.asarray(out["hidden"]), ref.hidden_states[-2].numpy(), rtol=1e-3, atol=1e-3
    )


def test_projection_tower():
    import torch

    tm = _torch_tiny("quick_gelu", with_projection=True)
    params = _convert(tm)
    ours = CLIPTextEncoder(OurCfg(
        vocab_size=VOCAB, width=WIDTH, layers=LAYERS, heads=HEADS,
        context_length=CTX, act="quick_gelu", output_layer=-1, projection_dim=16,
    ))
    ids = _ids()
    out = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = tm(input_ids=torch.as_tensor(ids.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out["proj"]), ref.text_embeds.numpy(), rtol=2e-4, atol=2e-4
    )

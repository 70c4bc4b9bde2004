"""Llava prompt-path bookkeeping parity vs the reference.

The Hunyuan prompt pipeline is intricate, index-heavy logic (SURVEY hard part
#4): `<image>`-token expansion (reference
``pipeline_hunyuan_video_image2video_lowpass.py:107-148``) and the
template/assistant crop + image-embed interleave (``:355-417``). This test
reimplements BOTH reference functions verbatim in test-local torch/numpy and
drives them and ``HunyuanVideoPipeline._get_llama_prompt_embeds`` with the
same crafted token streams through the same tiny Llava — the bookkeeping must
agree bitwise. Model-forward parity vs HF is covered separately
(``test_llama.py``); this isolates the indexing.

Cases pin the reference's quirks:
  * cumsum scatter + force-overwrite of ``[image_emb_start:image_emb_end]``
    (NOT a shift — rows without an ``<image>`` token lose the overwritten span)
  * masked position ids filled with 1 (``:144``), not 0
  * the truncated-prompt fallback: exactly 3 double-return tokens in the
    batch → crop at seq end (``:360-365``)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from alg_tpu.models.clip import CLIPVisionConfig, clip_preprocess
from alg_tpu.models.llama import LlamaConfig, LlavaConfig, init_llava

pytestmark = pytest.mark.fast


# -- reference :107-148, verbatim torch -------------------------------------

def _reference_expand(text_input_ids, prompt_attention_mask, max_sequence_length,
                      image_token_index, image_emb_len, image_emb_start,
                      image_emb_end, pad_token_id):
    special_image_token_mask = text_input_ids == image_token_index
    num_special_image_tokens = torch.sum(special_image_token_mask, dim=-1)
    batch_indices, non_image_indices = torch.where(text_input_ids != image_token_index)

    max_expanded_length = max_sequence_length + (num_special_image_tokens.max() * (image_emb_len - 1))
    new_token_positions = torch.cumsum((special_image_token_mask * (image_emb_len - 1) + 1), -1) - 1
    text_to_overwrite = new_token_positions[batch_indices, non_image_indices]

    expanded_input_ids = torch.full(
        (text_input_ids.shape[0], max_expanded_length), pad_token_id, dtype=text_input_ids.dtype
    )
    expanded_input_ids[batch_indices, text_to_overwrite] = text_input_ids[batch_indices, non_image_indices]
    expanded_input_ids[batch_indices, image_emb_start:image_emb_end] = image_token_index

    expanded_attention_mask = torch.zeros(
        (text_input_ids.shape[0], max_expanded_length), dtype=prompt_attention_mask.dtype
    )
    attn_batch_indices, attention_indices = torch.where(expanded_input_ids != pad_token_id)
    expanded_attention_mask[attn_batch_indices, attention_indices] = 1.0
    expanded_attention_mask = expanded_attention_mask.to(prompt_attention_mask.dtype)
    position_ids = (expanded_attention_mask.cumsum(-1) - 1).masked_fill_((expanded_attention_mask == 0), 1)
    return expanded_input_ids, expanded_attention_mask, position_ids


# -- reference :355-417, verbatim torch (operating on a given hidden) -------

def _reference_crop(prompt_embeds, text_input_ids, prompt_attention_mask, crop_start,
                    image_emb_len, image_emb_start, image_emb_end,
                    double_return_token_id, image_embed_interleave):
    text_crop_start = crop_start - 1 + image_emb_len
    batch_indices, last_double_return_token_indices = torch.where(text_input_ids == double_return_token_id)

    if last_double_return_token_indices.shape[0] == 3:
        # in case the prompt is too long
        last_double_return_token_indices = torch.cat(
            (last_double_return_token_indices, torch.tensor([text_input_ids.shape[-1]]))
        )
        batch_indices = torch.cat((batch_indices, torch.tensor([0])))

    last_double_return_token_indices = last_double_return_token_indices.reshape(
        text_input_ids.shape[0], -1
    )[:, -1]
    batch_indices = batch_indices.reshape(text_input_ids.shape[0], -1)[:, -1]
    assistant_crop_start = last_double_return_token_indices - 1 + image_emb_len - 4
    assistant_crop_end = last_double_return_token_indices - 1 + image_emb_len
    attention_mask_assistant_crop_start = last_double_return_token_indices - 4
    attention_mask_assistant_crop_end = last_double_return_token_indices

    prompt_embed_list, prompt_attention_mask_list = [], []
    image_embed_list, image_attention_mask_list = [], []
    for i in range(text_input_ids.shape[0]):
        prompt_embed_list.append(
            torch.cat([
                prompt_embeds[i, text_crop_start: assistant_crop_start[i].item()],
                prompt_embeds[i, assistant_crop_end[i].item():],
            ])
        )
        prompt_attention_mask_list.append(
            torch.cat([
                prompt_attention_mask[i, crop_start: attention_mask_assistant_crop_start[i].item()],
                prompt_attention_mask[i, attention_mask_assistant_crop_end[i].item():],
            ])
        )
        image_embed_list.append(prompt_embeds[i, image_emb_start:image_emb_end])
        image_attention_mask_list.append(
            torch.ones(image_embed_list[-1].shape[0]).to(prompt_attention_mask.dtype)
        )
    prompt_embed_list = torch.stack(prompt_embed_list)
    prompt_attention_mask_list = torch.stack(prompt_attention_mask_list)
    image_embed_list = torch.stack(image_embed_list)
    image_attention_mask_list = torch.stack(image_attention_mask_list)
    if 0 < image_embed_interleave < 6:
        image_embed_list = image_embed_list[:, ::image_embed_interleave, :]
        image_attention_mask_list = image_attention_mask_list[:, ::image_embed_interleave]
    out_embeds = torch.cat([image_embed_list, prompt_embed_list], dim=1)
    out_mask = torch.cat([image_attention_mask_list, prompt_attention_mask_list], dim=1)
    return out_embeds, out_mask


# -- fixtures ----------------------------------------------------------------

IMG, PAD, DRT = 60, 0, 7  # image token, pad, double-return ids
TEMPLATE = {
    "template": "{}",
    "crop_start": 4,
    "image_emb_start": 5,
    "image_emb_end": 11,
    "image_emb_len": 6,
    "double_return_token_id": DRT,
}


@pytest.fixture(scope="module")
def tiny_llava():
    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6,
        ),
        vision=CLIPVisionConfig(
            hidden_size=24, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            hidden_act="quick_gelu",
        ),
        image_token_index=IMG,
        pad_token_id=PAD,
    )
    params = init_llava(jax.random.PRNGKey(0), cfg)
    image = (np.random.RandomState(3).rand(40, 40, 3) * 255).astype(np.uint8)
    return cfg, params, image


def _row(max_len, image_pos, drt_positions, seed):
    """One right-padded id row with <image>/double-return at fixed positions."""
    rng = np.random.RandomState(seed)
    n_real = max(drt_positions) + 3 if drt_positions else max_len - 2
    row = rng.randint(10, 50, size=max_len).astype(np.int64)
    row[n_real:] = PAD
    if image_pos is not None:
        row[image_pos] = IMG
    for p in drt_positions:
        row[p] = DRT
    mask = (row != PAD).astype(np.int64)
    return row, mask


CASES = {
    # image token exactly at image_emb_start, 4 double-returns (the real-
    # tokenizer layout), interleave 2
    "standard": dict(rows=[(5, [2, 9, 14, 20])], interleave=2),
    # truncation quirk: exactly 3 double-returns in the batch → crop at end
    "truncated_3drt": dict(rows=[(5, [2, 9, 14])], interleave=2),
    # batch of two rows with equal double-return counts, interleave 4
    "batch2": dict(rows=[(5, [2, 9, 14, 20]), (5, [3, 8, 13, 19])], interleave=4),
    # image token NOT at image_emb_start: the reference scatter+overwrite
    # stomps [start:end] rather than shifting — must match exactly
    "offset_image": dict(rows=[(8, [2, 12, 16, 21])], interleave=2),
    # no image token at all: expansion degenerates to the overwrite
    "no_image": dict(rows=[(None, [2, 9, 14, 20])], interleave=2),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_llava_prompt_bookkeeping_parity(tiny_llava, case):
    from alg_tpu.pipelines import HunyuanVideoPipeline

    cfg, params, image = tiny_llava
    spec = CASES[case]
    max_seq = 20
    max_len = max_seq + TEMPLATE["crop_start"]

    rows = [_row(max_len, ip, dp, seed=11 + i) for i, (ip, dp) in enumerate(spec["rows"])]
    ids = np.stack([r for r, _ in rows])
    mask = np.stack([m for _, m in rows])

    pipe = HunyuanVideoPipeline(
        transformer_cfg=None, transformer_params=None, vae_cfg=None,
        vae_params=None, llava_cfg=cfg, llava_params=params,
        tokenize_llama=lambda prompts, ml: (ids, mask),
    )
    ours_e, ours_m = pipe._get_llama_prompt_embeds(
        image, ["x"] * ids.shape[0], TEMPLATE, max_seq, spec["interleave"]
    )

    # reference side: verbatim expansion, the same Llava forward, verbatim crop
    t_ids = torch.from_numpy(ids)
    t_mask = torch.from_numpy(mask)
    exp_ids, exp_mask, pos_ids = _reference_expand(
        t_ids, t_mask, max_len, IMG, TEMPLATE["image_emb_len"],
        TEMPLATE["image_emb_start"], TEMPLATE["image_emb_end"], PAD,
    )
    pixels = clip_preprocess(image, cfg.vision.image_size)
    # same jitted forward as the pipeline uses — the model itself is
    # parity-tested vs HF in test_llama.py; here only the (bitwise) indexing
    # around it is under test
    hidden = np.asarray(
        pipe._llava_forward(
            params,
            jnp.asarray(exp_ids.numpy()),
            jnp.asarray(np.repeat(pixels, ids.shape[0], 0)),
            jnp.asarray(exp_mask.numpy()),
            jnp.asarray(pos_ids.numpy()),
        )
    )
    ref_e, ref_m = _reference_crop(
        torch.from_numpy(hidden), t_ids, t_mask, TEMPLATE["crop_start"],
        TEMPLATE["image_emb_len"], TEMPLATE["image_emb_start"],
        TEMPLATE["image_emb_end"], DRT, spec["interleave"],
    )

    np.testing.assert_array_equal(np.asarray(ours_m), ref_m.numpy())
    np.testing.assert_array_equal(np.asarray(ours_e), ref_e.numpy())

"""LLM token bridge: audio-code <-> LLM-token mapping and vocab expansion.

Behavioral twin of the reference's token plumbing
(distilcodec/distil_codec.py:200-422): builds the ``<|g{g}r{r}_{id+offset}|>``
token map with 8 special tokens on top of a base-LLM vocab offset (152064 =
Qwen2.5-7B padded vocab, configs/model_config.json:12), splices
``codebook/scale`` rows into the LLM embedding + lm_head, and reseeds unused
codebook entries from top-K-distant valid codes.

The reference's special-token id skips (+5/+6/+7 entries carrying absolute ids
+7/+8/+9, distil_codec.py:248-262) are replicated verbatim for drop-in parity.
"""

from __future__ import annotations

import json
import os

import numpy as np


def construct_audio_code(
    codebooks: np.ndarray, tokens_id_offset: int = 0
) -> dict:
    """codebooks: (G, R, K, D) stacked codebook array -> token-map dict
    (reference: distil_codec.py:200-265)."""
    gr_audio_code2token = {}
    code_index_diff = tokens_id_offset
    codebook_size = 0
    n_groups, n_residuals = codebooks.shape[0], codebooks.shape[1]
    for g_number in range(n_groups):
        for r_number in range(n_residuals):
            codebook_size = codebooks.shape[2]
            code_numbers_str = {}
            for n in range(codebook_size):
                code_numbers_str[str(n)] = {
                    "content": f"<|g{g_number}r{r_number}_{n + code_index_diff}|>",
                    "absolute_token_id": n + code_index_diff,
                    "in_codebook_id": n,
                }
            gr_audio_code2token[f"g{g_number}r{r_number}"] = {
                "codebook_size": codebook_size,
                "audio_code_token": code_numbers_str,
            }
        # NOTE: reference increments once per *group* loop iteration
        # (distil_codec.py:220) — replicated exactly.
        code_index_diff += codebook_size

    specials = [
        ("<|beginofaudio|>", "Audio output mode begin descriptor", 0),
        ("<|endofaudio|>", "Audio output mode end descriptor", 1),
        ("<|sil|>", "Audio silence descriptor", 2),
        ("<|inter_audio_begin|>", "Interleave Audio output mode begin descriptor", 3),
        ("<|inter_audio_end|>", "Interleave Audio output mode end descriptor", 4),
        # reference quirk: keys +5/+6/+7 carry absolute ids +7/+8/+9
        # (distil_codec.py:248-262)
        ("<|cot_begin|>", "Cot begin descriptor", 7),
        ("<|cot_end|>", "Cot end descriptor", 8),
        ("<|unused600|>", "unused end descriptor", 9),
    ]
    special_tokens = {}
    for key_off, (content, desc, abs_off) in zip(
        (0, 1, 2, 3, 4, 5, 6, 7), specials
    ):
        special_tokens[str(code_index_diff + key_off)] = {
            "content": content,
            "description": desc,
            "absolute_token_id": code_index_diff + abs_off,
        }
    gr_audio_code2token["special_audio_tokens"] = special_tokens
    return gr_audio_code2token


def audio_tokenize(
    code2token: dict, codes: list, n_groups: int, n_residual: int
) -> list:
    """Flat interleaved code list -> token-info dicts
    (reference: distil_codec.py:532-543)."""
    n_gr = n_groups * n_residual
    gr_codes = [codes[i : i + n_gr] for i in range(0, len(codes), n_gr)]
    new_codes = []
    for gr in gr_codes:
        group_codes = [gr[i : i + n_residual] for i in range(0, len(gr), n_residual)]
        for g, gr_code in enumerate(group_codes):
            for r, re_code in enumerate(gr_code):
                new_codes.append(
                    code2token[f"g{g}r{r}"]["audio_code_token"][str(re_code)]
                )
    return new_codes


def get_codebook(
    codebooks: np.ndarray, code2token: dict, is_one_codebook: bool = False
):
    """(reference: distil_codec.py:267-292) returns (token-map w/ codebooks or
    audio_tokens_all, concatenated codebook or None)."""
    audio_tokens = []
    flat = []
    n_groups, n_residuals = codebooks.shape[0], codebooks.shape[1]
    for g in range(n_groups):
        for r in range(n_residuals):
            cb = np.asarray(codebooks[g, r])
            if is_one_codebook:
                flat.append(cb)
                tok = code2token[f"g{g}r{r}"]["audio_code_token"]
                audio_tokens.extend(tok[k]["content"] for k in tok.keys())
            else:
                code2token[f"g{g}r{r}"]["codebook"] = cb
    code2token["audio_tokens_all"] = audio_tokens
    codebook_cat = np.concatenate(flat, axis=0) if is_one_codebook else None
    return code2token, codebook_cat


def pairwise_sq_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Reference ``_pairwise_distance`` (distil_codec.py:424-432) — note it
    uses un-squared norms (||a|| - 2ab + ||b||), replicated exactly."""
    dot = a @ b.T
    a_norm = np.linalg.norm(a, axis=1, keepdims=True)
    b_norm = np.linalg.norm(b, axis=1, keepdims=True).T
    return a_norm - 2 * dot + b_norm


def reset_codebook_embeddings(
    codebook: np.ndarray, valid_codes: list, top_k: int = 6
) -> np.ndarray:
    """Re-seed unused codes from the mean of the top-K *most distant* valid
    codes (reference: distil_codec.py:434-486, descending sort at :459).

    Returns the new codebook ordered [valid..., reseeded...] exactly like the
    reference's ``torch.cat([valid_embd, new_unvalid_embd])``.
    """
    n_codes = codebook.shape[0]
    valid = codebook[valid_codes]
    invalid_idx = sorted(set(range(n_codes)) - set(valid_codes))
    invalid = codebook[invalid_idx]
    if len(invalid_idx) == 0:
        return codebook.copy()
    distances = pairwise_sq_distance(invalid, valid)
    top = np.argsort(-distances, axis=-1)[:, :top_k]
    new_invalid = valid[top].mean(axis=1)
    return np.concatenate([valid, new_invalid], axis=0)


def llm_token_expanding(
    codebooks: np.ndarray,
    code2token: dict,
    llm_path: str,
    saved_path: str,
    tokens_id_offset: int,
    codebook_dim: int,
    is_random_init: bool = False,
    audio_scale_factor: float = 100.0,
    is_test: bool = False,
):
    """Splice the audio codebook into an LLM's embedding/lm_head/tokenizer
    (reference: distil_codec.py:302-422).  Requires ``transformers`` + the base
    model on disk; everything else in this framework works without it."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    text_model = AutoModelForCausalLM.from_pretrained(
        llm_path, torch_dtype=torch.bfloat16
    )
    code2token, audio_embeddings = get_codebook(
        codebooks, code2token, is_one_codebook=True
    )
    audio_embeddings = torch.from_numpy(np.asarray(audio_embeddings))
    n_audio_tokens = audio_embeddings.shape[0]
    norm_audio_embedding = audio_embeddings / audio_scale_factor

    special_tokens_info = code2token["special_audio_tokens"]
    n_special_tokens = len(special_tokens_info)

    text_embeddings = text_model.get_input_embeddings()
    n_text_tokens = text_embeddings.weight.data.shape[0]
    assert n_text_tokens == tokens_id_offset
    embd_dim = text_embeddings.weight.data.shape[1]
    assert embd_dim == codebook_dim
    mean_text_embedding = text_embeddings.weight.data.mean(dim=0)

    new_total = n_text_tokens + n_audio_tokens + n_special_tokens
    new_embeddings = torch.nn.Embedding(new_total, embd_dim, dtype=torch.bfloat16)
    new_embeddings.weight.data[:n_text_tokens] = text_embeddings.weight.data
    new_embeddings.weight.data[n_text_tokens : n_text_tokens + n_audio_tokens] = (
        norm_audio_embedding.bfloat16()
        if not is_random_init
        else torch.zeros(n_audio_tokens, embd_dim, dtype=torch.bfloat16)
    )
    new_embeddings.weight.data[n_text_tokens + n_audio_tokens :] = (
        mean_text_embedding.repeat(n_special_tokens, 1)
        if not is_random_init
        else torch.zeros(n_special_tokens, embd_dim, dtype=torch.bfloat16)
    )
    text_model.set_input_embeddings(new_embeddings)

    lm_head = text_model.lm_head
    new_lm_head = torch.nn.Linear(
        embd_dim, new_total, bias=False, dtype=torch.bfloat16
    )
    new_lm_head.weight.data[:n_text_tokens] = lm_head.weight.data[:n_text_tokens]
    new_lm_head.weight.data[n_text_tokens : n_text_tokens + n_audio_tokens] = (
        norm_audio_embedding.bfloat16()
        if not is_random_init
        else torch.zeros(n_audio_tokens, embd_dim, dtype=torch.bfloat16)
    )
    mean_special_head = lm_head.weight.data.mean(dim=0)
    new_lm_head.weight.data[n_text_tokens + n_audio_tokens :] = (
        mean_special_head.repeat(n_special_tokens, 1)
        if not is_random_init
        else torch.zeros(n_special_tokens, embd_dim, dtype=torch.bfloat16)
    )
    text_model.lm_head = new_lm_head

    os.makedirs(saved_path, exist_ok=True)
    text_model.save_pretrained(saved_path)
    config_path = os.path.join(saved_path, "config.json")
    with open(config_path) as f:
        model_config = json.load(f)
    model_config["vocab_size"] = new_total
    with open(config_path, "w") as f:
        json.dump(model_config, f, indent=4)

    tokenizer = AutoTokenizer.from_pretrained(llm_path)
    real_vocab = tokenizer.vocab_size + len(tokenizer.added_tokens_decoder)
    unused = [f"<|unused{i}|>" for i in range(n_text_tokens - real_vocab)]
    tokenizer.add_tokens(new_tokens=unused + code2token["audio_tokens_all"])
    specials = [
        special_tokens_info[k]["content"] for k in special_tokens_info.keys()
    ]
    tokenizer.add_special_tokens({"additional_special_tokens": specials})
    tokenizer.save_pretrained(saved_path)
    return saved_path

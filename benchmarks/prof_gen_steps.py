import time, types, numpy as np
from egom2p_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from egom2p_tpu.cli import eval_common
from egom2p_tpu.data.video_ingest import read_video
from egom2p_tpu.data.modality_info import MODALITY_INFO
from egom2p_tpu.generate import (build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
import egom2p_tpu.generate.sampler as S

args = types.SimpleNamespace(
    ckpt="./ckpt/checkpoint-main", video_tok_ckpt="./ckpt/cosmos-dv4x8x8",
    cam_tok_ckpt="./ckpt/checkpoint-cam", gaze_tok_ckpt="./ckpt/checkpoint-gaze",
    model="egom2p_base_12e_12d_swiglu_nobias", smoke=True, seed=0)
model, params = eval_common.load_main_model(args)
vid_tok = eval_common.load_video_tokenizer(args)
sampler = S.GenerationSampler(model, params)
B = 8
clip = read_video("/root/reference/example_data/rgb2dep_h2o.mp4", out_size=256)
video = jnp.asarray(np.repeat(clip[None], B, axis=0))
tok = vid_tok.forward(video, device_out=True)
tokens = tok.reshape(B, -1).astype(jnp.int32)

def make_sample():
    s = {"tok_rgb": {"tensor": tokens,
                     "input_mask": np.zeros((B, 5120), bool),
                     "target_mask": np.ones((B, 5120), bool)}}
    init_empty_target_modality(s, MODALITY_INFO, "tok_depth", B, 5120)
    init_full_input_modality(s, MODALITY_INFO, "tok_rgb")
    return s

schedule = build_chained_generation_schedules(
    cond_domains=["tok_rgb"], target_domains=["tok_depth"],
    tokens_per_target=[5120], autoregression_schemes=["roar"],
    decoding_steps=[3], token_decoding_schedules=["linear"],
    temps=[0.01], temp_schedules=["constant"], cfg_scales=[2.0],
    cfg_schedules=["constant"], cfg_grow_conditioning=True)

# instrument: wrap the cached fused fn maker so each returned fn syncs + times
orig = sampler._fused_img_step_fn
import functools
@functools.wraps(orig)
def timed_maker(*a, **kw):
    fn = orig(*a, **kw)
    meta = (a[1], a[2], a[3])  # num_enc_c, num_enc_u, k
    def wrapped(*fa):
        t0 = time.time()
        out = fn(*fa)
        _ = float(np.asarray(out[0]).ravel()[0])  # force sync
        print("  step enc_c=%d enc_u=%d k=%d: %.1f ms" % (*meta, (time.time()-t0)*1000))
        return out
    return wrapped
sampler._fused_img_step_fn = timed_maker

print("compile pass:")
sampler.generate(make_sample(), schedule, top_p=0.8, top_k=0.0, seed=0)
print("timed pass:")
t0 = time.time()
sampler.generate(make_sample(), schedule, top_p=0.8, top_k=0.0, seed=1)
print("total generate: %.1f ms (incl per-step sync overhead)" % ((time.time()-t0)*1000))

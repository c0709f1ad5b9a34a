// Test-only harness around the REFERENCE implementation (libfalcon), compiled
// at test time from /root/reference by tests/test_reference_e2e.py. Original
// code: it drives the reference C API (libfalcon.h:149-335) to dump
// tokenization and logits so the TPU stack can be compared end-to-end on the
// identical GGCC file.
//
// Usage:
//   ref_harness <model.ggcc> tokenize <text_file> <out_ids.bin>
//       falcon_tokenize(add_bos=false) over the file's content; writes int32.
//   ref_harness <model.ggcc> eval <ids.bin> <out_logits.bin> <n_ctx> <n_batch>
//       falcon_eval with logits_all over the ids in n_batch chunks; writes
//       (n_tokens, n_vocab) float32 row-major (the falcon_perplexity batched
//       eval pattern, falcon_perplexity.cpp:45-81).

#include "libfalcon.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static std::string read_file(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::string s(n, '\0');
    if (fread(&s[0], 1, n, f) != (size_t)n) { exit(2); }
    fclose(f);
    return s;
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s <model> tokenize|eval <in> <out> [n_ctx n_batch]\n", argv[0]);
        return 2;
    }
    const char *model_path = argv[1];
    const std::string cmd = argv[2];
    const char *in_path = argv[3];
    const char *out_path = argv[4];
    int n_ctx = argc > 5 ? atoi(argv[5]) : 256;
    int n_batch = argc > 6 ? atoi(argv[6]) : 32;

    falcon_init_backend();
    falcon_context_params params = falcon_context_default_params();
    params.n_ctx = n_ctx;
    params.n_batch = n_batch;
    params.n_gpu_layers = 0;
    params.seed = 0;
    params.f16_kv = false;
    params.logits_all = true;
    params.use_mmap = true;
    params.vocab_only = (cmd == "tokenize");

    // optional 8th arg: a 'ggla' adapter applied before eval
    // (llama_apply_lora_from_file, libfalcon.h:187). In-place patching
    // requires a writable model (no read-only mmap).
    const char *lora_path = argc > 8 ? argv[8] : NULL;
    params.use_mmap = !(lora_path && *lora_path);

    falcon_context *ctx = falcon_init_from_file(model_path, params);
    if (!ctx) { fprintf(stderr, "model load failed\n"); return 1; }
    if (lora_path && *lora_path) {
        if (llama_apply_lora_from_file(ctx, lora_path, NULL, 2)) {
            fprintf(stderr, "lora apply failed\n");
            return 1;
        }
    }

    if (cmd == "tokenize") {
        std::string text = read_file(in_path);
        std::vector<falcon_token> ids(text.size() + 8);
        int n = falcon_tokenize(ctx, text.c_str(), ids.data(), (int)ids.size(), false);
        if (n < 0) { fprintf(stderr, "tokenize overflow (%d)\n", n); return 1; }
        FILE *f = fopen(out_path, "wb");
        fwrite(ids.data(), sizeof(falcon_token), n, f);
        fclose(f);
        fprintf(stderr, "tokenized %zu bytes -> %d tokens\n", text.size(), n);
        return 0;
    }

    if (cmd == "eval") {
        std::string blob = read_file(in_path);
        const int n_tokens = (int)(blob.size() / sizeof(int32_t));
        std::vector<falcon_token> ids(n_tokens);
        memcpy(ids.data(), blob.data(), blob.size());
        const int n_vocab = falcon_n_vocab(ctx);

        FILE *f = fopen(out_path, "wb");
        for (int start = 0; start < n_tokens; start += n_batch) {
            const int bs = n_tokens - start < n_batch ? n_tokens - start : n_batch;
            falcon_evaluation_config cfg;
            cfg.n_tokens = bs;
            cfg.n_past = start;
            cfg.n_threads = 2;
            if (falcon_eval(ctx, ids.data() + start, cfg)) {
                fprintf(stderr, "eval failed at %d\n", start);
                return 1;
            }
            const float *logits = falcon_get_logits(ctx);
            fwrite(logits, sizeof(float), (size_t)bs * n_vocab, f);
        }
        fclose(f);
        fprintf(stderr, "eval: %d tokens x %d vocab\n", n_tokens, n_vocab);
        return 0;
    }

    if (cmd == "generate") {
        // greedy decode: eval the prompt in n_batch chunks, then argmax one
        // token at a time through the incremental KV path (the falcon_main
        // generation loop shape, falcon_main.cpp:820-1056, temp=0)
        const int n_gen = argc > 7 ? atoi(argv[7]) : 16;
        std::string blob = read_file(in_path);
        const int n_prompt = (int)(blob.size() / sizeof(int32_t));
        std::vector<falcon_token> ids(n_prompt);
        memcpy(ids.data(), blob.data(), blob.size());
        const int n_vocab = falcon_n_vocab(ctx);

        int n_past = 0;
        for (int start = 0; start < n_prompt; start += n_batch) {
            const int bs = n_prompt - start < n_batch ? n_prompt - start : n_batch;
            falcon_evaluation_config cfg;
            cfg.n_tokens = bs;
            cfg.n_past = n_past;
            cfg.n_threads = 2;
            if (falcon_eval(ctx, ids.data() + start, cfg)) return 1;
            n_past += bs;
        }
        std::vector<falcon_token> out;
        falcon_token tok = ids.back();
        for (int i = 0; i < n_gen; i++) {
            const float *logits = falcon_get_logits(ctx);
            const float *row = logits + (size_t)(i == 0 ? (n_prompt - 1) % n_batch
                                                        : 0) * n_vocab;
            falcon_token best = 0;
            for (int v = 1; v < n_vocab; v++)
                if (row[v] > row[best]) best = v;
            out.push_back(best);
            tok = best;
            falcon_evaluation_config cfg;
            cfg.n_tokens = 1;
            cfg.n_past = n_past;
            cfg.n_threads = 2;
            if (falcon_eval(ctx, &tok, cfg)) return 1;
            n_past += 1;
        }
        FILE *f = fopen(out_path, "wb");
        fwrite(out.data(), sizeof(falcon_token), out.size(), f);
        fclose(f);
        fprintf(stderr, "generated %d tokens\n", n_gen);
        return 0;
    }

    fprintf(stderr, "unknown command %s\n", cmd.c_str());
    return 2;
}

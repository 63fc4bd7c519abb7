.( ## TPU extension demo: language-model tier + KV-cache serving ## ) cr
0 trace

.( ### a tiny char-level LM: embed -> causal attn -> proj ) cr
1 8 1 1 nn.model                    \ 1 sequence of 8 token ids
16 4 nn.embed                        \ dim 16, vocab 4
layernorm 1 2 nn.attn tanh          \ causal attention block (2 heads)
layernorm 4 nn.proj softmax         \ per-position logits over the vocab
constant lm0
lm0 network

.( ### memorize a repeating pattern 0 1 2 3 ... ) cr
8 vector{ 0 1 2 3 0 1 2 3 } 1 8 1 1 reshape4 constant xin
32 vector{ 0 1 0 0  0 0 1 0  0 0 0 1  1 0 0 0
           0 1 0 0  0 0 1 0  0 0 0 1  1 0 0 0 }
1 8 4 1 reshape4 constant tgt       \ onehot next-token targets
lm0 xin forward tgt nn.onehot= drop
variable lox
: step ( -- ) lm0 xin forward loss.ce lox ! backprop 0.01 nn.adam drop ;
: train ( n -- ) 1- for step next ;
lm0 xin forward loss.ce ." loss before = " . drop
100 train
lm0 xin forward loss.ce ." , after 100 steps = " . cr drop

.( ### serve: extend the prompt 0 1 2 3 by 12 tokens, KV-cache decode ) cr
lm0 4 vector{ 0 1 2 3 } 12 nn.gen
." generated: " . cr
drop

bye
